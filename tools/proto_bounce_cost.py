"""Decompose the fused-path per-bounce cost at the canonical config's
full-size wavefront (190 blocks = 194,560 lanes): intersect kernel alone,
+ pk gather, + shade kernel, compaction, and the lax.switch operand toll.

Run on TPU. Informs where the remaining 57.4 -> 62.5 Mrays/s lives.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pathtracer_tpu.models import shirley
from pathtracer_tpu.ops.pallas import sphere_kernel as sk
from pathtracer_tpu.ops.pallas import shade_kernel as shk
from pathtracer_tpu.ops.pallas import compact_kernel as ck
from pathtracer_tpu.ops.lds import Sampler


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # honest sync
    t0 = time.monotonic()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.monotonic() - t0) / reps


def main():
    scene, camera, background = shirley.build(600 / 300)
    rows = 190 * 8  # the canonical config's tiled wavefront
    n = rows * sk.LANES
    rs = np.random.RandomState(0)
    org = np.zeros((n, 3), np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    state = jnp.concatenate(
        [jnp.asarray(org).T, jnp.asarray(d).T,
         jnp.ones((3, n), jnp.float32),
         jnp.ones((1, n), jnp.float32)]).reshape(10, rows, sk.LANES)
    off = jnp.arange(n, dtype=jnp.uint32).reshape(rows, sk.LANES)
    rad = jnp.zeros((3, rows, sk.LANES), jnp.float32)

    tables = sk.pack_spheres_pallas(scene.center, scene.radius, scene.valid)
    pack_t = shk.pack_material_tables(scene.shade_pack)
    sampler = Sampler(2 + 2 * 8)
    hi = np.asarray(sampler.hi)
    lo = np.asarray(sampler.lo)
    limbs = jnp.asarray([[hi[2], lo[2]], [hi[3], lo[3]]], jnp.uint32)
    bg_mode, bg_colors = background.pallas_params
    bg_colors = jnp.asarray(bg_colors, jnp.float32)

    def isect_only(B, oz=False):
        @jax.jit
        def fn(st):
            def body(c, _):
                at, idx = sk.intersect_state_pallas(tables, c,
                                                    origin_zero=oz)
                c = c.at[9].mul(jnp.sign(at))  # keep the loop serial
                return c, None
            st, _ = lax.scan(body, st, None, length=B)
            return st
        return fn

    def isect_gather(B):
        @jax.jit
        def fn(st):
            def body(c, _):
                at, idx = sk.intersect_state_pallas(tables, c)
                pk = pack_t[:, :, idx & 127]
                c = c.at[9].mul(jnp.sign(at) * jnp.sign(pk[3, 0] + 1.0))
                return c, None
            st, _ = lax.scan(body, st, None, length=B)
            return st
        return fn

    def full_bounce(B):
        @jax.jit
        def fn(st, rd):
            def body(c, _):
                st_, rd_ = c
                at, idx = sk.intersect_state_pallas(tables, st_)
                st2, rd2 = shk.shade_pallas(st_, pack_t, idx, off, at,
                                            limbs, bg_colors, rad_in=rd_,
                                            bg_mode=bg_mode)
                return (st2, rd2), None
            (st, rd), _ = lax.scan(body, (st, rd), None, length=B)
            return st, rd
        return fn

    def compaction(K):
        @jax.jit
        def fn(st):
            s = jnp.zeros(())
            for _ in range(K):
                stc, offc, k = ck.compact_blocks(st, off)
                st2, off2, nl = ck.pack_rows(stc, offc, k)
                dm = ck.dest_map((st[9] > 0.0), k)
                st = st * (1.0 + 0.0 * st2[0, 0, 0])  # serialize
                s = s + dm[0]
            return st, s
        return fn

    def branch(fac):
        def br(st, of):
            p = rows // fac
            return jnp.sum(st[:, :p]) + jnp.sum(of[:p].astype(jnp.float32))
        return br

    def switch_toll(K):
        @jax.jit
        def fn(st):
            sel = (st[0, 0, 0] > -1.0).astype(jnp.int32)
            s = jnp.zeros(())
            for _ in range(K):
                s = s + lax.switch(sel, [branch(f)
                                         for f in (1, 2, 4, 8, 16)],
                                   st, off)
                st = st * (1.0 + 0.0 * s * 1e-30)
            return s
        return fn

    def marginal(make, lo, hi, *args, reps=20):
        f_lo, f_hi = make(lo), make(hi)
        t_lo = min(timeit(f_lo, *args, reps=reps) for _ in range(3))
        t_hi = min(timeit(f_hi, *args, reps=reps) for _ in range(3))
        return (t_hi - t_lo) / (hi - lo), t_lo

    m_i, _ = marginal(isect_only, 4, 36, state)
    m_iz, _ = marginal(lambda B: isect_only(B, True), 4, 36, state)
    m_ig, _ = marginal(isect_gather, 4, 36, state)
    m_f, _ = marginal(full_bounce, 4, 36, state, rad)
    m_c, _ = marginal(compaction, 1, 9, state)
    m_s, _ = marginal(switch_toll, 1, 9, state)
    print(f"lanes={n} blocks={rows // 8}  (marginal per-op costs)")
    print(f"intersect bounce        : {m_i * 1e3:7.3f} ms")
    print(f"intersect bounce (oz)   : {m_iz * 1e3:7.3f} ms")
    print(f"intersect + pk gather   : {m_ig * 1e3:7.3f} ms")
    print(f"full bounce (i+g+shade) : {m_f * 1e3:7.3f} ms")
    print(f"compaction              : {m_c * 1e3:7.3f} ms")
    print(f"lax.switch toll         : {m_s * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()

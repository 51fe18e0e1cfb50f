"""Bisect the per-step cost of the traversal-step prototype."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 1 << 15
STEPS = 2048


def make(variant):
    def kernel(nodes_ref, state_ref, out_ref):
        org = state_ref[0:3, :]
        d = state_ref[3:6, :]
        inv_d = 1.0 / d

        def body(k, carry):
            i, acc, t_best = carry
            if variant >= 1:
                row = nodes_ref[pl.ds(i >> 4, 1), :]
            else:
                row = nodes_ref[pl.ds((k + 13) % (M // 16), 1), :]
            if variant >= 2:
                g = pltpu.roll(row, -(i & 15) * 8, axis=1)
            else:
                g = row
            if variant >= 3:
                lo_x = g[0, 0]
                lo_y = g[0, 1]
                lo_z = g[0, 2]
                hi_x = g[0, 3]
                hi_y = g[0, 4]
                hi_z = g[0, 5]
            else:
                lo_x = lo_y = lo_z = jnp.float32(-1.0)
                hi_x = hi_y = hi_z = jnp.sum(g) * 1e-30 + 1.0
            t0x = (lo_x - org[0]) * inv_d[0]
            t1x = (hi_x - org[0]) * inv_d[0]
            t0y = (lo_y - org[1]) * inv_d[1]
            t1y = (hi_y - org[1]) * inv_d[1]
            t0z = (lo_z - org[2]) * inv_d[2]
            t1z = (hi_z - org[2]) * inv_d[2]
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            if variant >= 4:
                anyhit = jnp.any(jnp.maximum(tn, 0.0)
                                 <= jnp.minimum(tf, t_best))
                gi = pltpu.bitcast(g, jnp.int32)
                nxt = jax.lax.select(anyhit, gi[0, 6] % M, gi[0, 7] % M)
                nxt = jnp.clip(jnp.abs(nxt), 0, M - 1)
            else:
                nxt = (i * 5 + 1) % M
            return nxt, acc + i, jnp.where(tn < tf,
                                           jnp.minimum(t_best, tf), t_best)

        i0 = jnp.int32(1)
        t0 = jnp.full((3, 128), 1e30, jnp.float32)
        i, acc, t_best = jax.lax.fori_loop(0, STEPS, body,
                                           (i0, jnp.int32(0), t0))
        out_ref[0, 0] = acc + i
        out_ref[0, 1] = t_best.astype(jnp.int32)[0, 0]
    return kernel


def run(variant):
    nodes = np.random.randn(M // 16, 128).astype(np.float32)
    state = np.random.randn(8, 128).astype(np.float32) + 2.0
    f = jax.jit(pl.pallas_call(
        make(variant),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    ))
    r = f(nodes, state)
    r.block_until_ready()
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        r = f(nodes, state)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep
    print(f"variant {variant}: {dt*1e3:8.2f} ms "
          f"-> {dt/STEPS*1e9:8.1f} ns/step", flush=True)


if __name__ == "__main__":
    for v in range(5):
        run(v)

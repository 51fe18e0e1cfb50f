"""Attribute the chunk-gather kernel's time: full kernel vs a variant with
the 128-photon broadcast loop removed (DMA + scalar survivor scan only) vs
a 4x-unrolled photon loop. Real hits/photons from one cornell/ganesha
iteration. Usage: python -m tools.proto_gather_cost [cornell|ganesha]

HISTORICAL: this probe carries its own copy of the ROUND-4 in-kernel
scalar-survivor-scan gather (u8-quantized chunk bboxes in SMEM) and
rebuilds that design's cbq/qparams from the current build_photon_chunks
sub-boxes. Its numbers (loop overhead ~23%, unroll wins) motivated the
XLA-side list + mask-gated unrolled-sub design that replaced it.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtracer_tpu.ops.pallas import gather_kernel as gk

CHB = gk.CHB
BLOCK_ROWS = gk.BLOCK_ROWS
LANES = gk.LANES


def make_kernel(mode):
    def _kernel(r_ref, qp_ref, cb_ref, hits_ref, photons_hbm, out_ref,
                scratch, sem):
        act = hits_ref[6] > 0.0
        any_act = jnp.max(hits_ref[6]) > 0.0
        zero = jnp.zeros((BLOCK_ROWS, LANES), jnp.float32)
        out_ref[0], out_ref[1], out_ref[2] = zero, zero, zero

        @pl.when(any_act)
        def _run():
            x, y, z = hits_ref[0], hits_ref[1], hits_ref[2]
            nx, ny, nz = hits_ref[3], hits_ref[4], hits_ref[5]
            r = r_ref[0, 0]
            inv_r = 1.0 / r
            r2 = r * r
            big = np.float32(3.0e38)

            def mmin(v):
                return jnp.min(jnp.where(act, v, big))

            def mmax(v):
                return jnp.max(jnp.where(act, v, -big))

            glo0, glo1, glo2 = qp_ref[0, 0], qp_ref[0, 1], qp_ref[0, 2]
            icq0, icq1, icq2 = qp_ref[0, 3], qp_ref[0, 4], qp_ref[0, 5]

            def q_lo(v, glo, icq):
                return jnp.clip(jnp.floor((v - glo) * icq),
                                np.float32(0.0), np.float32(255.0)).astype(
                    jnp.int32)

            def q_hi(v, glo, icq):
                return jnp.clip(jnp.ceil((v - glo) * icq),
                                np.float32(0.0), np.float32(255.0)).astype(
                    jnp.int32)

            bl0 = q_lo(mmin(x) - r, glo0, icq0)
            bl1 = q_lo(mmin(y) - r, glo1, icq1)
            bl2 = q_lo(mmin(z) - r, glo2, icq2)
            bh0 = q_hi(mmax(x) + r, glo0, icq0)
            bh1 = q_hi(mmax(y) + r, glo1, icq1)
            bh2 = q_hi(mmax(z) + r, glo2, icq2)

            n_chunks = cb_ref.shape[1]
            m8 = jnp.int32(0xFF)

            def live(ci):
                wl = cb_ref[0, ci]
                wh = cb_ref[1, ci]
                return (((wh & m8) >= bl0) & ((wl & m8) <= bh0)
                        & (((wh >> 8) & m8) >= bl1)
                        & (((wl >> 8) & m8) <= bh1)
                        & ((wh >> 16) >= bl2) & ((wl >> 16) <= bh2))

            def next_live(ci):
                def cond(j):
                    return (j < n_chunks) & ~live(
                        jnp.minimum(j, n_chunks - 1))

                return lax.while_loop(cond, lambda j: j + 1, ci)

            def get_dma(slot, ci):
                off = pl.multiple_of(ci * CHB, CHB)
                return pltpu.make_async_copy(
                    photons_hbm.at[:, pl.ds(off, CHB)], scratch.at[slot],
                    sem.at[slot])

            first = next_live(jnp.int32(0))

            @pl.when(first < n_chunks)
            def _warm():
                get_dma(0, first).start()

            def cond(state):
                return state[0] < n_chunks

            def photon_at(j, slot, accs):
                a0, a1, a2 = accs
                dx = scratch[slot, 0, j] - x
                dy = scratch[slot, 1, j] - y
                dz = scratch[slot, 2, j] - z
                d2 = dx * dx + dy * dy + dz * dz
                ndot = (scratch[slot, 3, j] * nx
                        + scratch[slot, 4, j] * ny
                        + scratch[slot, 5, j] * nz)
                ok = (d2 < r2) & (ndot > np.float32(1e-3))
                w = 1.0 - jnp.sqrt(d2) * inv_r
                wf = jnp.where(ok, w, 0.0)
                return (a0 + wf * scratch[slot, 6, j],
                        a1 + wf * scratch[slot, 7, j],
                        a2 + wf * scratch[slot, 8, j])

            def body(state):
                ci, slot, a0, a1, a2 = state
                nxt = next_live(ci + 1)

                @pl.when(nxt < n_chunks)
                def _prefetch():
                    get_dma(1 - slot, nxt).start()

                get_dma(slot, ci).wait()

                if mode == "noloop":
                    # touch one scratch scalar so the DMA isn't dead
                    a0 = a0 + scratch[slot, 0, 0] * np.float32(1e-30)
                elif mode == "full":
                    def pb(j, accs):
                        return photon_at(j, slot, accs)

                    a0, a1, a2 = lax.fori_loop(0, CHB, pb, (a0, a1, a2))
                elif mode.startswith("unroll"):
                    u = int(mode[6:])

                    def pb(k, accs):
                        for t in range(u):
                            accs = photon_at(k * u + t, slot, accs)
                        return accs

                    a0, a1, a2 = lax.fori_loop(0, CHB // u, pb,
                                               (a0, a1, a2))
                return nxt, 1 - slot, a0, a1, a2

            _, _, a0, a1, a2 = lax.while_loop(
                cond, body, (first, jnp.int32(0), zero, zero, zero))
            out_ref[0] = jnp.where(act, a0, 0.0)
            out_ref[1] = jnp.where(act, a1, 0.0)
            out_ref[2] = jnp.where(act, a2, 0.0)

    return _kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def gather_mode(point, normal, active, cbq, qparams, photons_t, radius,
                mode="full"):
    n = point.shape[0]
    rows = n // LANES
    grid = rows // BLOCK_ROWS
    hits = jnp.concatenate(
        [point.T, normal.T,
         active[None].astype(jnp.float32)]).reshape(7, rows, LANES)
    r_in = jnp.full((1, 1), radius, jnp.float32)
    qp = qparams.reshape(1, 8)

    def spec3(lead):
        return pl.BlockSpec((lead, BLOCK_ROWS, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        make_kernel(mode),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec3(7),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=spec3(3),
        out_shape=jax.ShapeDtypeStruct((3, rows, LANES), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2, 16, CHB), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(r_in, qp, cbq, hits, photons_t)
    return out.reshape(3, n).T


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    from pathtracer_tpu import ppm as P

    W = H = 600
    mesh = None
    if which == "cornell":
        from pathtracer_tpu.models import cornell
        scene, camera, lights = cornell.build(1.0)
        effb = 4
    else:
        from pathtracer_tpu.models import ganesha
        scene, camera, lights, mesh, bbox = ganesha.build(
            "scenes/big_ganesha.ply", 1.0)
        effb = 1

    trace_photons, total, dep_lanes = P.make_photon_pass(
        scene, lights, 75000, 4, "pallas", mesh=mesh)
    mesh_consts = mesh.device_consts() if mesh is not None else None
    rend = P.PPMRenderer(scene=scene, camera=camera, lights=lights,
                         width=W, height=H, iterations=1, verbose=False,
                         mesh=mesh)
    r = jnp.float32(rend.radius(1))

    pos, nrm, flux, ok = trace_photons(jnp.uint32(0))
    grid = gk.build_photon_chunks(pos, nrm, flux, ok)
    jax.block_until_ready(grid)

    ep = P.make_eye_pass(camera, W, H, 4, 75000, dep_lanes, "pallas",
                         mesh=mesh, band_rows=256, use_kernel=False,
                         eff_bounces=effb)
    walk_j = jax.jit(ep.walk)
    bands = []
    for bi in range(3):
        fd_pt, fd_nrm, fd_beta, fd_ok = walk_j(
            jnp.uint32(0), jnp.int32(bi * 256), mesh_consts, scene)
        key = gk.hit_morton_keys(fd_pt, fd_ok)
        perm = jnp.argsort(key)
        bands.append((fd_pt[perm], fd_nrm[perm], fd_ok[perm]))
        jax.block_until_ready(bands[-1])

    # rebuild the old design's u8-quantized chunk boxes from the new
    # exact sub-chunk boxes (chunk box = union of its 4 sub boxes)
    photons_t, sbox = grid
    sb = np.asarray(sbox)  # (6, n_sub)
    nsub_per = gk.CHB // gk.SUB
    c_lo = sb[:3].T.reshape(-1, nsub_per, 3).min(axis=1)  # (C, 3)
    c_hi = sb[3:].T.reshape(-1, nsub_per, 3).max(axis=1)
    fin = c_lo[:, 0] <= c_hi[:, 0]
    glo = c_lo[fin].min(axis=0)
    ghi = c_hi[fin].max(axis=0)
    ext = np.maximum(ghi - glo, 1e-6).astype(np.float32)
    inv_cq = np.float32(255.0) / ext
    ql = np.clip(np.floor((c_lo - glo) * inv_cq), 0, 255).astype(np.int32)
    qh = np.clip(np.ceil((c_hi - glo) * inv_cq), 0, 255).astype(np.int32)
    ql[~fin] = 255
    qh[~fin] = 0
    cbq = jnp.asarray(np.stack([
        ql[:, 0] | (ql[:, 1] << 8) | (ql[:, 2] << 16),
        qh[:, 0] | (qh[:, 1] << 8) | (qh[:, 2] << 16)]))
    qparams = jnp.asarray(np.concatenate(
        [glo.astype(np.float32), inv_cq, np.zeros(2, np.float32)]))
    ref = None
    for mode in ("full", "noloop", "unroll4", "unroll8", "full"):
        outs = [gather_mode(p, nn, a, cbq, qparams, photons_t, r, mode=mode)
                for (p, nn, a) in bands]
        jax.block_until_ready(outs)
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            outs = [gather_mode(p, nn, a, cbq, qparams, photons_t, r,
                                mode=mode) for (p, nn, a) in bands]
            jax.block_until_ready(outs)
            best = min(best, time.monotonic() - t0)
        tag = ""
        if mode == "full" and ref is None:
            ref = [np.asarray(o) for o in outs]
        elif mode.startswith("unroll"):
            d = max(float(np.abs(np.asarray(o) - rr).max())
                    for o, rr in zip(outs, ref))
            tag = f"  maxdiff {d:.2e}"
        print(f"[{which}] {mode}: {best*1000:.1f} ms{tag}", flush=True)


if __name__ == "__main__":
    main()

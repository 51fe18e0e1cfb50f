"""Measure the Pallas broadcast-gather's streaming efficiency (host-side
replay, CPU): for a real cornell/ganesha iteration, compute per (block,
offset-row) the union range the kernel streams (chunked to 128) vs the
photons any lane actually needs, and the implied VPU-op budget.

The kernel's cost is ~20 VPU ops per streamed photon per 1024-lane block
(ops/pallas/gather_kernel.py). This tool answers: how much of that stream
is union-slop (no lane in range) or chunk-rounding, i.e. what a per-chunk
any-lane-overlap skip or tighter hit ordering could save.

Usage: python -m tools.proto_gather_stream [cornell|ganesha] [iter_idx]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    from pathtracer_tpu import ppm as P
    from pathtracer_tpu.ops.pallas import gather_kernel as gk

    if which == "cornell":
        from pathtracer_tpu.models import cornell
        scene, cam, lights = cornell.build(1.0)
        mesh = bbox = None
    else:
        from pathtracer_tpu.models import ganesha
        scene, cam, lights, mesh, bbox = ganesha.build(
            "scenes/big_ganesha.ply", 1.0)
    W = H = 600
    pc = 75000
    r_obj = P.PPMRenderer(scene=scene, camera=cam, lights=lights, width=W,
                          height=H, iterations=1, photon_count=pc,
                          max_bounces=4, verbose=False, mesh=mesh,
                          bbox_override=bbox)
    trace_photons, total, dep_lanes = P.make_photon_pass(
        scene, lights, pc, 4, "xla", mesh=mesh)
    radius = r_obj.radius(it + 1)
    pos, nrm, flux, ok = trace_photons(jnp.uint32(it * pc))
    grid = P._build_grid_morton_device(pos, nrm, flux, ok,
                                       jnp.float32(radius))
    photons_t, start_t, count_t, glo, cell = grid
    print(f"{which}: radius={radius:.4f} photons={int(ok.sum())} "
          f"cell={float(cell):.4f}")

    eff = 1 if P.scene_all_diffuse(scene, mesh) else 4
    band_rows = 256
    eye = P.make_eye_pass(cam, W, H, 4, pc, dep_lanes, "xla",
                          mesh=mesh, band_rows=band_rows, use_kernel=False,
                          eff_bounces=eff)
    consts = mesh.device_consts() if mesh is not None else None
    tot = dict(streamed=0, union=0, need=0, chunks=0, blocks=0,
               skip_chunks=0)
    for row0 in range(0, H, band_rows):
        fd_pt, fd_nrm, fd_beta, fd_ok = eye.walk(
            jnp.uint32(it * W * H), jnp.int32(row0), consts, scene)
        s_tab, e_tab, own_key = gk.query_tables(fd_pt, fd_ok, glo, cell,
                                                start_t, count_t)
        perm = jnp.argsort(jnp.where(fd_ok, own_key, jnp.int32(1 << 30)))
        s = np.asarray(s_tab[:, perm])
        e = np.asarray(e_tab[:, perm])
        n = s.shape[1]
        CH, BL = gk.CH, gk.BLOCK_ROWS * gk.LANES
        for b0 in range(0, n, BL):
            sb = s[:, b0:b0 + BL]
            eb = e[:, b0:b0 + BL]
            tot["blocks"] += 1
            for o in range(gk.N_OFF):
                has = eb[o] > sb[o]
                if not has.any():
                    continue
                smin = int(sb[o][has].min())
                emax = int(eb[o].max())
                c0 = (smin // CH) * CH
                nch = max(0, -(-(emax - c0) // CH))
                tot["chunks"] += nch
                tot["streamed"] += nch * CH
                # union of [s,e) over lanes in this block+offset
                iv = sorted((int(a), int(bz)) for a, bz in
                            zip(sb[o][has], eb[o][has]))
                u, cur_s, cur_e = 0, None, None
                for a, bz in iv:
                    if cur_e is None or a > cur_e:
                        if cur_e is not None:
                            u += cur_e - cur_s
                        cur_s, cur_e = a, bz
                    else:
                        cur_e = max(cur_e, bz)
                if cur_e is not None:
                    u += cur_e - cur_s
                tot["union"] += u
                tot["need"] += int((eb[o] - sb[o])[has].sum())
                # chunks where NO lane overlaps (skippable with a
                # per-chunk any-overlap test)
                for ci in range(nch):
                    lo = c0 + ci * CH
                    hi = lo + CH
                    if not ((sb[o] < hi) & (eb[o] > lo) & has).any():
                        tot["skip_chunks"] += 1
    st, un = tot["streamed"], tot["union"]
    print(f"blocks={tot['blocks']} chunks={tot['chunks']} "
          f"streamed={st} union={un} per-lane-sum={tot['need']}")
    print(f"union/streamed = {un / max(1, st):.3f} "
          f"(slop {st - un} photons-broadcasts wasted)")
    print(f"skippable dead chunks: {tot['skip_chunks']} "
          f"({tot['skip_chunks'] / max(1, tot['chunks']):.1%})")
    # implied kernel time at ~20 ops/photon-broadcast, (8,128) per op
    print(f"photon-broadcast count {st} -> ~{st * 20} VPU (8,128)-ops")


if __name__ == "__main__":
    main()

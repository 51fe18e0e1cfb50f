"""Split the PPM eye band into walk vs gather on real hardware.

The phase probe (proto_ppm_iter_phases) showed eye bands are now the
dominant PPM slice for BOTH scenes (cornell 0.150 s, ganesha 0.18 s of
~0.16/0.28 s iterations). This probe times the specular eye walk and the
Pallas chunk-bbox flux gather as separate jits over every band of one
iteration, steady state, to pick the next target.

Usage: python -m tools.proto_eye_split [cornell|ganesha] [--cpu]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")


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

    t0 = time.monotonic()
    float((jnp.arange(8.0) + 1.0)[0])
    print(f"warmup {time.monotonic()-t0:.1f}s", flush=True)

    trace_photons, total, dep_lanes = P.make_photon_pass(
        scene, lights, 75000, 4, "pallas", mesh=mesh)
    mesh_consts = mesh.device_consts() if mesh is not None else None

    rend = P.PPMRenderer(scene=scene, camera=camera, lights=lights,
                         width=W, height=H, iterations=1, verbose=False,
                         mesh=mesh)
    r = rend.radius(1)
    print(f"radius {r:.4f}", flush=True)

    pos, nrm, flux, ok = trace_photons(jnp.uint32(0))
    from pathtracer_tpu.ops.pallas import gather_kernel as gk
    grid = gk.build_photon_chunks(pos, nrm, flux, ok)
    jax.block_until_ready(grid)

    band_rows = 256
    use_tile = mesh is not None and effb == 1
    tile_static = None
    tile_consts_by_band = None
    if use_tile:
        from pathtracer_tpu.ops.pallas import tile_tri_kernel as ttk
        tt = ttk.build_tile_tri_table(
            camera, np.asarray(mesh.tri_a), np.asarray(mesh.tri_e1),
            np.asarray(mesh.tri_e2), W, H, bvh=mesh)
        bands, n_tiles = ttk.band_chunk_maps(tt, band_rows, 0)
        src_lane, back = ttk.lane_maps(W, band_rows, tt.tx_n)
        tile_static = dict(src_lane=src_lane, back=back, n_tiles=n_tiles,
                           interpret=jax.default_backend() != "tpu")
        table_j = jnp.asarray(tt.table)
        jax.block_until_ready(table_j)
        tile_consts_by_band = [
            (table_j,) + tuple(jnp.asarray(x) for x in b) for b in bands]

    ep = P.make_eye_pass(camera, W, H, 4, 75000, dep_lanes, "pallas",
                         mesh=mesh, band_rows=band_rows, use_kernel=True,
                         eff_bounces=effb, tile_static=tile_static)
    walk_j = jax.jit(ep.walk)
    gather = ep.make_gather(dep_lanes)

    @jax.jit
    def gather_j(fd_pt, fd_nrm, fd_ok, rr, grid):
        return gather(fd_pt, fd_nrm, fd_ok, rr, grid)

    full_j = jax.jit(ep)

    n_bands = -(-H // band_rows)
    rr = jnp.float32(r)

    def tc(bi):
        return tile_consts_by_band[bi] if tile_consts_by_band else None

    # compile
    outs = [walk_j(jnp.uint32(0), jnp.int32(bi * band_rows), mesh_consts,
                   scene, tc(bi)) for bi in range(n_bands)]
    jax.block_until_ready(outs)
    g0 = [gather_j(o[0], o[1], o[3], rr, grid) for o in outs]
    jax.block_until_ready(g0)
    f0 = [full_j(jnp.uint32(0), rr, grid, jnp.int32(bi * band_rows),
                 mesh_consts, scene, tc(bi)) for bi in range(n_bands)]
    jax.block_until_ready(f0)
    print("compiles done", flush=True)

    for trial in range(3):
        t0 = time.monotonic()
        outs = [walk_j(jnp.uint32(0), jnp.int32(bi * band_rows),
                       mesh_consts, scene, tc(bi))
                for bi in range(n_bands)]
        jax.block_until_ready(outs)
        t_walk = time.monotonic() - t0
        t0 = time.monotonic()
        g = [gather_j(o[0], o[1], o[3], rr, grid) for o in outs]
        jax.block_until_ready(g)
        t_gather = time.monotonic() - t0
        t0 = time.monotonic()
        f = [full_j(jnp.uint32(0), rr, grid, jnp.int32(bi * band_rows),
                    mesh_consts, scene, tc(bi)) for bi in range(n_bands)]
        jax.block_until_ready(f)
        t_full = time.monotonic() - t0
        print(f"[{which}] trial {trial}: walk {t_walk:.3f}s  "
              f"gather {t_gather:.3f}s  full(fused) {t_full:.3f}s  "
              f"({n_bands} bands x {band_rows} rows)", flush=True)


if __name__ == "__main__":
    main()

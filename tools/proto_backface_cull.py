"""How much of the ganesha per-tile triangle lists is back-facing?

For eye rays (all from the camera-space origin) a tile's direction set
is EXACTLY the conical hull of its 4 corner directions, so
min_i dot(n_tri, corner_i) > 0 proves every ray in the tile can hit the
triangle only back-facing. For a watertight shell viewed from outside,
the nearest hit is always front-facing, so those rows are dead weight in
the tile kernel. This probe counts them (host only, no TPU).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pathtracer_tpu.models import ganesha
    from pathtracer_tpu.ops.pallas import tile_tri_kernel as ttk

    scene, cam, lights, mesh, bbox = ganesha.build(
        "scenes/big_ganesha.ply", 1.0)
    W = H = 600
    t0 = time.perf_counter()
    tt = ttk.build_tile_tri_table(cam, mesh.tri_a, mesh.tri_e1, mesh.tri_e2,
                                  W, H, bvh=mesh)
    print(f"table build {time.perf_counter()-t0:.2f}s")

    # corner dirs per tile, PPM convention (flip_y=False), same formula
    # as ops/frustum.tile_frustum_planes
    tile = ttk.TILE
    tx_n, ty_n = tt.tx_n, tt.ty_n
    xs = np.arange(tx_n + 1) * (tile / W)
    ys = np.arange(ty_n + 1) * (tile / H)
    cx = np.broadcast_to(xs[None, :], (ty_n + 1, tx_n + 1))
    cy = np.broadcast_to(ys[:, None], (ty_n + 1, tx_n + 1))
    dirs = np.stack([cam.lower_left_x + cam.view_x * cx,
                     cam.lower_left_y + cam.view_y * cy,
                     np.full(cx.shape, -1.0)], axis=-1)
    corners = np.stack([dirs[:-1, :-1], dirs[:-1, 1:], dirs[1:, :-1],
                        dirs[1:, 1:]], axis=2).reshape(-1, 4, 3)

    normals = np.cross(mesh.tri_e1, mesh.tri_e2).astype(np.float64)

    total = 0
    kept = 0
    start = tt.tile_chunk_start
    CH = ttk.CHUNK
    for t in range(tx_n * ty_n):
        s0, s1 = int(start[t]) * CH, int(start[t + 1]) * CH
        col = tt.table[9, s0:s1]
        live = (tt.table[0:9, s0:s1] != 0).any(axis=0)
        idx = col[live].astype(np.int64)
        if not len(idx):
            continue
        n = normals[idx]
        d = n @ corners[t].T  # (k, 4)
        # margin: drop only when confidently all-positive
        scale = (np.abs(n).sum(1) * np.abs(corners[t]).sum() / 4)
        keep = d.min(axis=1) < 1e-9 * np.maximum(scale, 1e-30)
        total += len(idx)
        kept += int(keep.sum())
    print(f"tri-rows: {total} -> {kept} "
          f"({100.0 * (1 - kept / max(total, 1)):.1f}% back-facing)")


if __name__ == "__main__":
    main()

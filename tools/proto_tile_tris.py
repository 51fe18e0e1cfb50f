"""Probe: per-32x32-tile frustum-culled triangle counts for the ganesha
eye pass (600x600). Decides whether a dense (n_tiles, K, 9) streamed
Moller-Trumbore kernel can replace the BVH walk for coherent primaries.

  python -m tools.proto_tile_tris [scenes/big_ganesha.ply]
"""
import sys
import time

import numpy as np

from pathtracer_tpu.io import ply
from pathtracer_tpu.models import ganesha

TILE = 32


def tile_planes(cam, width, height):
    tyn = -(-height // TILE)
    txn = -(-width // TILE)
    xs = np.arange(txn + 1) * TILE / width
    ys = np.arange(tyn + 1) * TILE / height
    cx = np.broadcast_to(xs[None, :], (tyn + 1, txn + 1))
    cy = 1.0 - np.broadcast_to(ys[:, None], (tyn + 1, txn + 1))
    dirs = np.stack([cam.lower_left_x + cam.view_x * cx,
                     cam.lower_left_y + cam.view_y * cy,
                     np.full_like(cx, -1.0)], axis=-1)
    c00 = dirs[:-1, :-1].reshape(-1, 3)
    c01 = dirs[:-1, 1:].reshape(-1, 3)
    c10 = dirs[1:, :-1].reshape(-1, 3)
    c11 = dirs[1:, 1:].reshape(-1, 3)
    dc = c00 + c01 + c10 + c11
    planes = []
    for a, b in ((c00, c01), (c01, c11), (c11, c10), (c10, c00)):
        nrm = np.cross(a, b)
        nrm *= np.sign(np.sum(nrm * dc, axis=1, keepdims=True))
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-300)
        planes.append(nrm)
    return np.stack(planes, axis=1)  # (T, 4, 3)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/big_ganesha.ply"
    w = h = 600
    cam = ganesha.make_camera(w / h)
    p = ply.load(path)
    verts = np.stack([np.asarray(p.data["vertex"][k], np.float64)
                      for k in ("x", "y", "z")], axis=1)
    faces = None
    for el, cols in p.data.items():
        if "vertex_indices" in cols:
            faces = np.asarray(cols["vertex_indices"])
    vc = cam.transform_points(verts)
    a = vc[faces[:, 0]]
    b = vc[faces[:, 1]]
    c = vc[faces[:, 2]]
    lo = np.minimum(np.minimum(a, b), c).astype(np.float32)
    hi = np.maximum(np.maximum(a, b), c).astype(np.float32)
    n = len(faces)
    print(f"{n} tris", flush=True)

    planes = tile_planes(cam, w, h)  # (T,4,3)
    t0 = time.monotonic()
    # conservative box-vs-halfspace: box intersects halfspace n.x >= 0 iff
    # the p-vertex (per-axis max of n_i>0 ? hi : lo) has n.p >= 0
    counts = []
    t_n = planes.shape[0]
    for t in range(t_n):
        keep = np.ones(n, bool)
        for pi in range(4):
            nrm = planes[t, pi]
            pv = np.where(nrm > 0, hi, lo)  # (n,3)
            keep &= pv @ nrm >= 0.0
        counts.append(int(keep.sum()))
    counts = np.asarray(counts)
    dt = time.monotonic() - t0
    nz = counts[counts > 0]
    print(f"cull {dt:.1f}s  tiles={t_n} nonzero={len(nz)}")
    print(f"counts: mean={counts.mean():.0f} mean_nz={nz.mean():.0f} "
          f"p50={np.percentile(nz, 50):.0f} p90={np.percentile(nz, 90):.0f} "
          f"max={counts.max()}")
    k = counts.max()
    print(f"dense (T,K,9) f32 @ K=max: {t_n * k * 9 * 4 / 1e6:.0f} MB; "
          f"sum-of-counts work: {counts.sum() / 1e6:.2f} M tri-rows, "
          f"{counts.sum() * 1024 * 30 / 1e9:.0f} Gflop over full blocks")


if __name__ == "__main__":
    main()

"""Count BVH4-walk pointer-chase steps per coherence-sorted chunk on the
big mesh (host numpy replica of ops/bvh.make_mesh_traverser_bvh4's control
flow) — the BVH4 analog of tools/proto_walk_steps. Answers: how far did
the 4-wide rows actually cut the step count, and what do wasted
chain-entries cost? Usage: python -m tools.proto_walk_steps4 [ply] [chunk]
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.models import ganesha
from pathtracer_tpu.io import ply
from pathtracer_tpu.ops.bvh import MeshBVH, _coherence_key_fn


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/big_ganesha.ply"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cam = ganesha.make_camera(1.0)
    p = ply.load(path)
    verts = np.stack([np.asarray(p.data["vertex"][k], np.float64)
                      for k in ("x", "y", "z")], axis=1)
    faces = None
    for el, cols in p.data.items():
        if "vertex_indices" in cols:
            faces = np.asarray(cols["vertex_indices"])
    vc = cam.transform_points(verts)
    mesh = MeshBVH(vc, faces, np.zeros(12, np.float32), walk="bvh4")
    print(f"{mesh.n_tris} tris, depth {mesh.depth}, "
          f"stride {mesh.stride}, rows {mesh.table_j.shape[0]}", flush=True)

    n = 192 * 192
    ys, xs = np.divmod(np.arange(n), 192)
    cx = (xs.astype(np.float32) + 0.5) / 192.0
    cy = (ys.astype(np.float32) + 0.5) / 192.0
    d = np.asarray(cam.ray_dirs(jnp.asarray(cx), jnp.asarray(cy)))
    org = np.zeros((n, 3), np.float32)

    key_fn = _coherence_key_fn(mesh.bbox_lo, mesh.bbox_hi)
    key = np.asarray(key_fn(jnp.asarray(org), jnp.asarray(d),
                            jnp.ones(n, bool)))
    perm = np.argsort(key)
    org, d = org[perm], d[perm]

    table = np.asarray(mesh.table_j)
    tab_i = table.view(np.int32)
    node_end, stride = mesh.node_end, mesh.stride
    done = table.shape[0] - 1
    inv_d = 1.0 / d
    octs = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0)).astype(
        np.int64)

    per_lane = np.zeros(n, np.int64)
    n_node = n_tri = n_waste = 0  # waste: node row entered, no child hit
    worst = []
    for c0 in range(0, n, chunk):
        sel = slice(c0, min(n, c0 + chunk))
        ptr = octs[sel] * stride
        lret = np.full(ptr.shape, done)
        t_best = np.full(ptr.shape, 3.0e38, np.float32)
        o_, dd, idd = org[sel], d[sel], inv_d[sel]
        steps = 0
        live = ptr != done
        kcount = np.zeros(ptr.shape, np.int64)
        while live.any():
            steps += 1
            kcount[live] += 1
            rows = table[np.minimum(ptr, done)]
            rows_i = tab_i[np.minimum(ptr, done)]
            is_node = ptr < node_end
            boxes = rows[:, 0:24].reshape(-1, 4, 6)
            with np.errstate(invalid="ignore"):
                t0 = (boxes[:, :, 0:3] - o_[:, None, :]) * idd[:, None, :]
                t1 = (boxes[:, :, 3:6] - o_[:, None, :]) * idd[:, None, :]
            tn = np.max(np.minimum(t0, t1), axis=-1)
            tf = np.min(np.maximum(t0, t1), axis=-1)
            with np.errstate(invalid="ignore"):
                bh = np.maximum(tn, 0.0) <= np.minimum(tf, t_best[:, None])
            bh = bh & ~np.isnan(tn) & ~np.isnan(tf)
            any_hit = bh.any(1) & is_node
            first = np.argmax(bh, axis=1)
            enters = rows_i[:, 24:28]
            e_sel = np.take_along_axis(enters, first[:, None], 1)[:, 0]
            skp = rows_i[:, 28]
            nxt_node = np.where(any_hit, e_sel, skp)
            n_node += int((is_node & live).sum())
            n_waste += int((is_node & live & ~any_hit).sum())

            def mt(a, e1, e2, idx, t_best):
                pv = np.cross(dd, e2)
                det = np.sum(e1 * pv, axis=-1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    det_inv = 1.0 / det
                    tv = o_ - a
                    uu = det_inv * np.sum(tv * pv, axis=-1)
                    qv = np.cross(tv, e1)
                    vv = det_inv * np.sum(dd * qv, axis=-1)
                    tt = det_inv * np.sum(e2 * qv, axis=-1)
                ok = (~is_node & (np.abs(det) >= 1e-6) & (uu >= 0)
                      & (uu <= 1) & (vv >= 0) & (uu + vv <= 1) & (tt >= 0)
                      & (tt <= t_best))
                return np.where(ok, tt, t_best).astype(np.float32)

            t_best = mt(rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], 9, t_best)
            t_best = mt(rows[:, 12:15], rows[:, 15:18], rows[:, 18:21], 21,
                        t_best)
            n_tri += int((~is_node & live).sum())
            nxt_tri = np.where(rows[:, 10] > 0.5, lret, ptr + 1)
            nxt = np.where(is_node, nxt_node, nxt_tri)
            nxt = np.where(ptr == done, done, nxt)
            lret = np.where(is_node & any_hit & (e_sel >= node_end), skp,
                            lret)
            ptr = nxt
            live = ptr != done
        per_lane[sel] = kcount
        worst.append(steps)
    print(f"chunk={chunk}: chunks={len(worst)} sum_worst={sum(worst)} "
          f"mean_worst={np.mean(worst):.0f} max_worst={max(worst)}")
    print(f"per-lane steps: mean={per_lane.mean():.0f} "
          f"p50={np.percentile(per_lane, 50):.0f} "
          f"p95={np.percentile(per_lane, 95):.0f} max={per_lane.max()}")
    tot = n_node + n_tri
    print(f"lane-steps: node {n_node} ({n_node/tot:.2f}) tri {n_tri} "
          f"({n_tri/tot:.2f}) wasted-node {n_waste} ({n_waste/tot:.2f})")


if __name__ == "__main__":
    main()

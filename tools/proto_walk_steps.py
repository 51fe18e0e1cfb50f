"""Count octant-walk pointer-chase steps per coherence-sorted 4096-lane
chunk on the big mesh (host numpy replica of the walk's control flow; step
counts are platform-independent). Sizes the payoff of a wider-branching
BVH: on the tunneled TPU each while step costs ~fixed latency, so time ~
sum over chunks of worst-lane steps.
Usage: python -m tools.proto_walk_steps [ply] [chunk]
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.models import ganesha
from pathtracer_tpu.ops.bvh import _coherence_key_fn


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/big_ganesha.ply"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    scene, cam, lights, mesh, bbox = ganesha.build(path, 1.0)
    print(f"{mesh.n_tris} tris, depth {mesh.depth}", flush=True)

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
    node_end, m = mesh.node_end, mesh.m_nodes
    done = table.shape[0] - 1
    inv_d = 1.0 / d
    octs = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0)).astype(
        np.int64)

    per_lane = np.zeros(n, np.int64)
    worst = []
    for c0 in range(0, n, chunk):
        sel = slice(c0, min(n, c0 + chunk))
        ptr = octs[sel] * m
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
            lo, hi = rows[:, 0:3], rows[:, 3:6]
            t0 = (lo - o_) * idd
            t1 = (hi - o_) * idd
            tn = np.max(np.minimum(t0, t1), axis=-1)
            tf = np.min(np.maximum(t0, t1), axis=-1)
            box_hit = (np.maximum(tn, 0.0) <= np.minimum(tf, t_best)) & is_node
            enter = rows_i[:, 6]
            skp = rows_i[:, 7]
            is_leaf = enter >= node_end
            # triangle t update
            e2 = rows[:, 6:9]
            pv = np.cross(dd, e2)
            det = np.sum(rows[:, 3:6] * pv, axis=-1)
            with np.errstate(divide="ignore", invalid="ignore"):
                det_inv = 1.0 / det
                tv = o_ - rows[:, 0:3]
                uu = det_inv * np.sum(tv * pv, axis=-1)
                qv = np.cross(tv, rows[:, 3:6])
                vv = det_inv * np.sum(dd * qv, axis=-1)
                tt = det_inv * np.sum(e2 * qv, axis=-1)
            ok = (~is_node & (np.abs(det) >= 1e-6) & (uu >= 0) & (uu <= 1)
                  & (vv >= 0) & (uu + vv <= 1) & (tt >= 0) & (tt <= t_best))
            t_best = np.where(ok, tt, t_best).astype(np.float32)
            nxt_tri = np.where(rows[:, 10] > 0.5, lret, ptr + 1)
            nxt = np.where(is_node, np.where(box_hit, enter, skp), nxt_tri)
            nxt = np.where(ptr == done, done, nxt)
            lret = np.where(box_hit & is_leaf, skp, lret)
            ptr = nxt
            live = ptr != done
        per_lane[sel] = kcount
        worst.append(steps)
    print(f"chunk={chunk}: chunks={len(worst)} "
          f"sum_worst={sum(worst)} mean_worst={np.mean(worst):.0f} "
          f"max_worst={max(worst)}")
    print(f"per-lane steps: mean={per_lane.mean():.0f} "
          f"p50={np.percentile(per_lane, 50):.0f} "
          f"p95={np.percentile(per_lane, 95):.0f} max={per_lane.max()}")


if __name__ == "__main__":
    main()

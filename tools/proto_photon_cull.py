"""Size the payoff of a spot-light cone PVS for the photon pass: emit
bounce-0 photon rays for ganesha's two spot lights (the real sampler
stream, iteration 0), replay the octant walk's control flow in host numpy
(as proto_walk_steps does for eye rays), and split the step budget by
outcome:

  - root-miss lanes: exit after the first slab test (a PVS can't beat 1)
  - mesh-hit lanes: necessary work
  - bbox-hit-but-mesh-miss lanes: the ONLY work a direction-space PVS can
    remove (the ray pierces the root slab but no triangle)

If the third bucket owns a small share of total steps, the cone PVS idea
is dead and the photon walk's floor is coherence/caps tuning instead.
Usage: python -m tools.proto_photon_cull [ply] [photons]
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.models import ganesha
from pathtracer_tpu.ops.bvh import _coherence_key_fn
from pathtracer_tpu.ops.lds import Sampler
from pathtracer_tpu.ppm import _emit_rays, light_photon_counts


def walk_steps(mesh, org, d, chunk=4096, t_init=None):
    """Per-lane octant-walk step counts + nearest mesh t (host replica).
    t_init: optional per-lane initial t_best (e.g. the floor hit) — the
    reference caps the mesh walk at the floor t (ganesha main.ml:286-298);
    this measures how many steps that cap would prune."""
    n = org.shape[0]
    table = np.asarray(mesh.table_j)
    tab_i = table.view(np.int32)
    node_end, m = mesh.node_end, mesh.m_nodes
    done = table.shape[0] - 1
    inv_d = 1.0 / d
    octs = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0)).astype(
        np.int64)
    per_lane = np.zeros(n, np.int64)
    t_hit = np.full(n, 3.0e38, np.float32)
    for c0 in range(0, n, chunk):
        sel = slice(c0, min(n, c0 + chunk))
        ptr = octs[sel] * m
        lret = np.full(ptr.shape, done)
        t_best = (np.full(ptr.shape, 3.0e38, np.float32) if t_init is None
                  else t_init[sel].astype(np.float32).copy())
        o_, dd, idd = org[sel], d[sel], inv_d[sel]
        live = ptr != done
        kcount = np.zeros(ptr.shape, np.int64)
        while live.any():
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
        t_hit[sel] = t_best
    return per_lane, t_hit


def _octant_mesh(path, cam, mat_row):
    """Rebuild the mesh with the octant walk table (models/ganesha.py's
    load_mesh, but walk='octant' so the host step replica applies)."""
    from pathtracer_tpu.io import ply
    from pathtracer_tpu.ops.bvh import MeshBVH

    p = ply.load(path)
    verts_el = p.data["vertex"]
    verts = np.stack([np.asarray(verts_el[k], np.float64)
                      for k in ("x", "y", "z")], axis=1)
    faces = None
    for el, cols in p.data.items():
        if "vertex_indices" in cols:
            faces = np.asarray(cols["vertex_indices"])
    return MeshBVH(cam.transform_points(verts), faces, mat_row,
                   length_cutoff=8, walk="octant")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/big_ganesha.ply"
    photons = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    scene, cam, lights, mesh8, bbox = ganesha.build(path, 1.0)
    # the step replica models the octant (binary) walk — a proxy for the
    # BVH8 walk's relative cost split by outcome class
    mesh = _octant_mesh(path, cam, mesh8.mat_row)
    print(f"{mesh.n_tris} tris, depth {mesh.depth}", flush=True)

    counts, starts, total = light_photon_counts(lights, photons)
    sampler = Sampler(2 + 2 * 4)
    lanes = -(-total // 1024) * 1024
    lane_ids = jnp.arange(lanes, dtype=jnp.int32)
    offs = lane_ids.astype(jnp.uint32)
    u0 = sampler.get(offs, 0)
    v0 = sampler.get(offs, 1)
    org_j, d_j, _ = _emit_rays(lights, counts, starts, lane_ids, u0, v0,
                               jnp.float32)
    org = np.asarray(org_j)[:total]
    d = np.asarray(d_j)[:total]

    # sort by the walk's coherence key, as the device walk does
    key_fn = _coherence_key_fn(mesh.bbox_lo, mesh.bbox_hi)
    key = np.asarray(key_fn(jnp.asarray(org), jnp.asarray(d),
                            jnp.ones(total, bool)))
    perm = np.argsort(key)

    light_id = np.zeros(total, np.int64)
    for li, (c, s) in enumerate(zip(counts, starts)):
        light_id[s:s + c] = li
    light_id = light_id[perm]

    # root-slab test (the walk's first step already answers this)
    lo, hi = mesh.bbox_lo, mesh.bbox_hi
    with np.errstate(divide="ignore"):
        idd = 1.0 / d[perm]
    t0 = (lo[None] - org[perm]) * idd
    t1 = (hi[None] - org[perm]) * idd
    tn = np.max(np.minimum(t0, t1), axis=-1)
    tf = np.min(np.maximum(t0, t1), axis=-1)
    root_hit = np.maximum(tn, 0.0) <= tf

    steps, t_hit = walk_steps(mesh, org[perm], d[perm])
    mesh_hit = t_hit < 3.0e38
    cullable = root_hit & ~mesh_hit  # what a direction PVS could remove
    tot = steps.sum()
    print(f"photons={total}  steps total={tot}  "
          f"mean={steps.mean():.1f} p95={np.percentile(steps, 95):.0f}")
    for name, mask in (("root-miss", ~root_hit),
                       ("mesh-hit", mesh_hit),
                       ("cullable (bbox-hit, mesh-miss)", cullable)):
        print(f"  {name}: lanes={mask.mean() * 100:.1f}%  "
              f"steps={steps[mask].sum() * 100.0 / tot:.1f}%")
    for li in range(len(lights)):
        m = light_id == li
        print(f"  light{li}: lanes={m.mean() * 100:.1f}% "
              f"steps={steps[m].sum() * 100.0 / tot:.1f}% "
              f"mesh-hit={mesh_hit[m].mean() * 100:.1f}% "
              f"cullable-steps="
              f"{steps[m & cullable].sum() * 100.0 / tot:.1f}%")

    # floor-t cap: nearest hit of the scene's 2 floor triangles seeds the
    # walk's t_best (reference semantics, ganesha main.ml:286-298)
    from pathtracer_tpu.scene import TRI_A, TRI_E1, TRI_E2

    tp = np.asarray(scene.tri_pack)
    t_floor = np.full(total, 3.0e38, np.float32)
    o_, dd = org[perm], d[perm]
    for k in range(tp.shape[0]):
        a, e1, e2 = tp[k, TRI_A], tp[k, TRI_E1], tp[k, TRI_E2]
        pv = np.cross(dd, e2[None])
        det = np.sum(e1[None] * pv, axis=-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            det_inv = 1.0 / det
            tv = o_ - a[None]
            uu = det_inv * np.sum(tv * pv, axis=-1)
            qv = np.cross(tv, e1[None])
            vv = det_inv * np.sum(dd * qv, axis=-1)
            tt = det_inv * np.sum(e2[None] * qv, axis=-1)
        ok = ((np.abs(det) >= 1e-6) & (uu >= 0) & (uu <= 1) & (vv >= 0)
              & (uu + vv <= 1) & (tt >= 0))
        t_floor = np.where(ok & (tt < t_floor), tt, t_floor).astype(np.float32)
    steps_c, _ = walk_steps(mesh, o_, dd, t_init=t_floor)
    print(f"floor-t-seeded walk: steps total={steps_c.sum()} "
          f"({steps_c.sum() * 100.0 / tot:.1f}% of unseeded)")


if __name__ == "__main__":
    main()

"""Size the would-be per-sector triangle lists for ganesha's bounce-0
photon rays (host only).

Each spot light's emission (u,v) square partitions into n_r x n_v
sectors (u-bins are radial since r = R*sqrt(u): equal-COUNT bins under
the equidistributed sampler). A sector's direction set is conservatively
hulled by 4 corner dirs (outer radius inflated by 1/cos(dtheta/2) to
cover the arc). Lists come from the same C++ BVH cone-descent as the eye
tile cull, boxes translated to the light frame, then back-face culled.

Prints total tri-rows (the sector kernel's cost driver) vs the eye tile
table's, and the estimated kernel time at the eye kernel's measured
rate (~0.25 us per row-block).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def quat_rotate_inv_np(q, v):
    """numpy mirror of ops/quat.rotate_inv (rotate by conj(q))."""
    w, x, y, z = q
    # rotate v by q^{-1}: for unit q, conj
    qv = np.array([x, y, z])
    t = 2.0 * np.cross(v, qv)
    return v + w * t + np.cross(t, qv)


def sector_corners(n_r, n_v, R):
    """(n_r*n_v, 4, 3) local corner dirs hulled per sector."""
    out = []
    dth = 2.0 * np.pi / n_v
    infl = 1.0 / np.cos(dth / 2.0)
    for ir in range(n_r):
        # equal-count bins in u; r = R sqrt(u)
        r0 = R * np.sqrt(ir / n_r)
        r1 = R * np.sqrt((ir + 1) / n_r) * infl
        for iv in range(n_v):
            th0, th1 = iv * dth, (iv + 1) * dth
            cs = []
            for r in (r0, r1):
                for th in (th0, th1):
                    cs.append([r * np.cos(th), r * np.sin(th), 1.0])
            out.append(cs)
    return np.asarray(out)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pathtracer_tpu.models import ganesha
    from pathtracer_tpu import ppm as P
    from pathtracer_tpu.native import tile_cull_native

    scene, cam, lights, mesh, bbox = ganesha.build(
        "scenes/big_ganesha.ply", 1.0)
    counts, starts, total = P.light_photon_counts(lights, 75000)
    R = P._SPOT_DISK_RADIUS

    tri_a, tri_e1, tri_e2 = mesh.tri_a, mesh.tri_e1, mesh.tri_e2
    b = tri_a + tri_e1
    c = tri_a + tri_e2
    lo = np.minimum(np.minimum(tri_a, b), c).astype(np.float32)
    hi = np.maximum(np.maximum(tri_a, b), c).astype(np.float32)
    scale = np.maximum(np.abs(hi), np.abs(lo)).max(axis=1)
    margin = (1e-5 * np.maximum(scale, 1.0) + 2e-3).astype(np.float32)
    normals = np.cross(tri_e1.astype(np.float64), tri_e2.astype(np.float64))
    vol6 = float(np.einsum("ij,ij->", tri_a.astype(np.float64), normals))
    s_out = 1.0 if vol6 >= 0.0 else -1.0

    grand = 0
    grand_nobf = 0
    for li, (l, cnt) in enumerate(zip(lights, counts)):
        n_sec = -(-cnt // 800)
        n_v = 8
        n_r = max(1, -(-n_sec // n_v))
        loc = sector_corners(n_r, n_v, R)  # (S,4,3)
        S = loc.shape[0]
        world = np.stack([
            np.stack([quat_rotate_inv_np(l.quat, loc[s, k])
                      for k in range(4)]) for s in range(S)])
        # planes: 4 sides (adjacent corner cross products, sign toward
        # center) + axis halfspace
        axis = quat_rotate_inv_np(l.quat, np.array([0.0, 0.0, 1.0]))
        planes = np.zeros((S, 5, 3))
        order = [0, 1, 3, 2]  # corner cycle (r0,t0),(r0,t1),(r1,t1),(r1,t0)
        for s in range(S):
            ctr = world[s].sum(axis=0)
            for k in range(4):
                a_ = world[s, order[k]]
                b_ = world[s, order[(k + 1) % 4]]
                n = np.cross(a_, b_)
                nn = np.linalg.norm(n)
                if nn < 1e-12:  # degenerate (r0=0 apex): use axis
                    n = axis
                    nn = 1.0
                n = n / nn
                if np.dot(n, ctr) < 0:
                    n = -n
                planes[s, k] = n
            planes[s, 4] = axis
        pos = l.position.astype(np.float32)
        keep = tile_cull_native(mesh.nodes_lo - pos, mesh.nodes_hi - pos,
                                mesh.meta_np, lo - pos, hi - pos, margin,
                                planes)
        tot = 0
        tot_nobf = 0
        for s in range(S):
            idx = np.nonzero(keep[s])[0]
            tot_nobf += len(idx)
            if len(idx):
                d4 = (s_out * normals[idx]) @ world[s].T
                m = (np.abs(normals[idx]).sum(1)
                     * np.abs(world[s]).sum(1).max())
                idx = idx[d4.min(axis=1) <= 1e-12 * np.maximum(m, 1e-300)]
            tot += -(-max(len(idx), 1) // 256) * 256  # CHUNK padding
        grand += tot
        grand_nobf += tot_nobf
        print(f"light{li}: photons={cnt} sectors={n_r}x{n_v}={S} "
              f"rows(frustum)={tot_nobf} rows(+backface,padded)={tot} "
              f"mean/sector={tot // S}")
    print(f"TOTAL padded rows: {grand} (no-backface {grand_nobf}); "
          f"est kernel {grand * 0.25e-3:.1f} ms at the eye rate "
          f"vs ~55 ms bounce-0 walk share")


if __name__ == "__main__":
    main()

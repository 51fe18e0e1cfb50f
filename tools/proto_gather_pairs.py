"""Count surviving (block, chunk) pairs in the chunk-bbox gather for one
steady-state iteration: how much VPU broadcast work the bbox cull leaves,
and what finer culls (smaller CHB, sub-chunk bboxes, exact f32 boxes,
normal cones) would remove. Host-side replica of the kernel's u8 test.

Usage: python -m tools.proto_gather_pairs [cornell|ganesha]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    from pathtracer_tpu import ppm as P
    from pathtracer_tpu.ops.pallas import gather_kernel as gk

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

    pos, nrm, flux, ok = trace_photons(jnp.uint32(0))
    pos, nrm, ok = map(np.asarray, (pos, nrm, ok))

    ep = P.make_eye_pass(camera, W, H, 4, 75000, dep_lanes, "pallas",
                         mesh=mesh, band_rows=256, use_kernel=False,
                         eff_bounces=effb)
    # hits for all 3 bands via the XLA walk (cull study only: no tile
    # kernel -> ganesha walks the BVH8, slower but identical hits)
    pts, nms, oks = [], [], []
    for bi in range(3):
        fd_pt, fd_nrm, fd_beta, fd_ok = jax.jit(ep.walk)(
            jnp.uint32(0), jnp.int32(bi * 256), mesh_consts, scene)
        pts.append(np.asarray(fd_pt))
        nms.append(np.asarray(fd_nrm))
        oks.append(np.asarray(fd_ok))
    point = np.concatenate(pts)
    normal = np.concatenate(nms)
    active = np.concatenate(oks)

    # --- replicate build_photon_chunks on host (f32) ---
    valid = ok
    big = np.float32(3.0e38)
    posm = np.where(valid[:, None], pos, big).astype(np.float32)
    glo = posm.min(0)
    ghi = np.where(valid[:, None], pos, -big).max(0).astype(np.float32)
    ext = np.maximum(ghi - glo, 1e-9).astype(np.float32)
    cm = np.clip(((pos - glo) / ext * 1024.0).astype(np.int64), 0, 1023)
    key = (np.asarray(gk.morton3(jnp.asarray(cm[:, 0], jnp.int32),
                                 jnp.asarray(cm[:, 1], jnp.int32),
                                 jnp.asarray(cm[:, 2], jnp.int32)))
           .astype(np.int64))
    key = np.where(valid, key, 1 << 30)
    order = np.argsort(key, kind="stable")
    npho = pos.shape[0]
    np_pad = -(-npho // gk.CHB) * gk.CHB
    pv = np.full((np_pad, 3), big, np.float32)
    pv[:npho] = posm[order]
    vs = np.zeros(np_pad, bool)
    vs[:npho] = valid[order]
    nv = np.zeros((np_pad, 3), np.float32)
    nv[:npho] = nrm[order]
    n_chunks = np_pad // gk.CHB
    pvr = pv.reshape(n_chunks, gk.CHB, 3)
    vsr = vs.reshape(n_chunks, gk.CHB)
    c_lo = np.where(vsr[..., None], pvr, big).min(1)
    c_hi = np.where(vsr[..., None], pvr, -big).max(1)
    inv_cq = 255.0 / ext
    ql = np.clip(np.floor((c_lo - glo) * inv_cq), 0, 255)
    qh = np.clip(np.ceil((c_hi - glo) * inv_cq), 0, 255)
    empty = c_lo[:, 0] > c_hi[:, 0]
    ql[empty] = 255
    qh[empty] = 0

    # --- per-iteration radii of the first few iterations ---
    for it in (1, 4):
        r = np.float32(rend.radius(it))
        # hit-side morton sort per band of 256 rows (as production does)
        tot_pairs = 0
        tot_pairs_f32 = 0     # exact f32 chunk bbox vs block bbox + r
        tot_pairs_sub = 0     # 32-photon sub-chunk bboxes (u8)
        tot_photon_in_r = 0   # photons that actually pass d2 < r2
        n_blocks_tot = 0
        for bi in range(3):
            sl = slice(bi * 256 * W, (bi + 1) * 256 * W)
            p_b, n_b, a_b = point[sl], normal[sl], active[sl]
            k = np.asarray(gk.hit_morton_keys(jnp.asarray(p_b),
                                              jnp.asarray(a_b)))
            perm = np.argsort(k, kind="stable")
            p_s, a_s = p_b[perm], a_b[perm]
            nlanes = p_s.shape[0]
            nblk = nlanes // 1024
            pb = p_s.reshape(nblk, 1024, 3)
            ab = a_s.reshape(nblk, 1024)
            anyact = ab.any(1)
            blo = np.where(ab[..., None], pb, big).min(1) - r
            bhi = np.where(ab[..., None], pb, -big).max(1) + r
            qbl = np.clip(np.floor((blo - glo) * inv_cq), 0, 255)
            qbh = np.clip(np.ceil((bhi - glo) * inv_cq), 0, 255)
            # u8 overlap test (kernel's): (B, C)
            ov = np.ones((nblk, n_chunks), bool)
            for ax in range(3):
                ov &= (qh[None, :, ax] >= qbl[:, None, ax]) \
                    & (ql[None, :, ax] <= qbh[:, None, ax])
            ov &= anyact[:, None]
            tot_pairs += int(ov.sum())
            ovf = np.ones((nblk, n_chunks), bool)
            for ax in range(3):
                ovf &= (c_hi[None, :, ax] >= blo[:, None, ax]) \
                    & (c_lo[None, :, ax] <= bhi[:, None, ax])
            ovf &= anyact[:, None]
            tot_pairs_f32 += int(ovf.sum())
            n_blocks_tot += int(anyact.sum())
            # 32-photon sub-chunks, exact f32 boxes
            sub = gk.CHB // 32
            pvs = pv.reshape(n_chunks * sub, 32, 3)
            vss = vs.reshape(n_chunks * sub, 32)
            s_lo = np.where(vss[..., None], pvs, big).min(1)
            s_hi = np.where(vss[..., None], pvs, -big).max(1)
            ovs = np.ones((nblk, n_chunks * sub), bool)
            for ax in range(3):
                ovs &= (s_hi[None, :, ax] >= blo[:, None, ax]) \
                    & (s_lo[None, :, ax] <= bhi[:, None, ax])
            ovs &= anyact[:, None]
            tot_pairs_sub += int(ovs.sum())
        print(f"[{which}] iter {it} r={r:.4f}: blocks {n_blocks_tot}, "
              f"chunks {n_chunks}", flush=True)
        print(f"  u8 pairs {tot_pairs}  (photon-broadcasts "
              f"{tot_pairs * gk.CHB / 1e6:.1f} M, est VPU "
              f"{tot_pairs * gk.CHB * 21e-9:.3f} s at 21 ns/bcast)")
        print(f"  exact-f32 pairs {tot_pairs_f32} "
              f"({tot_pairs_f32 / max(tot_pairs, 1):.2f}x of u8)")
        print(f"  32-photon sub-chunks (f32): {tot_pairs_sub} "
              f"-> broadcasts {tot_pairs_sub * 32 / 1e6:.1f} M "
              f"({tot_pairs_sub * 32 / max(tot_pairs * gk.CHB, 1):.2f}x)",
              flush=True)


if __name__ == "__main__":
    main()

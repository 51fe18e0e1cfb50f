"""Tile-frustum-culled triangle kernel (ops/pallas/tile_tri_kernel.py) vs
the full brute-force Möller–Trumbore oracle.

The kernel + cull must reproduce the all-triangles nearest hit exactly:
any mismatch means either the conservative frustum cull dropped a hittable
triangle or the kernel's strict-< ascending-index running min diverged from
the oracle's argmin (ops/triangles.intersect_tris lowest-index-tie rule).
"""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.camera import Camera
from pathtracer_tpu.ops import triangles as tri_ops
from pathtracer_tpu.ops.pallas import tile_tri_kernel as ttk


def _random_tris(n, rng):
    # camera-space cloud in front of the camera (z in [-6, -1]) plus some
    # behind / far outside the frustum to exercise the cull
    a = rng.uniform(-3, 3, (n, 3))
    a[:, 2] = rng.uniform(-6, -1, n)
    a[: n // 8, 2] = rng.uniform(1, 4, n // 8)  # behind the camera
    a[n // 8: n // 4, 0] += 50.0  # far off-frustum
    e1 = rng.uniform(-0.8, 0.8, (n, 3))
    e2 = rng.uniform(-0.8, 0.8, (n, 3))
    return (a.astype(np.float32), e1.astype(np.float32),
            e2.astype(np.float32))


def test_tile_tri_kernel_matches_bruteforce_oracle():
    rng = np.random.default_rng(7)
    w = h = 64
    band_rows = 64
    cam = Camera.create(eye=(0, 0, 0), target=(0, 0, -1), up=(0, 1, 0),
                        aspect=w / h, vertical_fov_deg=60.0)
    a, e1, e2 = _random_tris(600, rng)

    tt = ttk.build_tile_tri_table(cam, a, e1, e2, w, h)
    bands, n_tiles = ttk.band_chunk_maps(tt, band_rows)
    assert len(bands) == 1
    src_lane, back = ttk.lane_maps(w, band_rows, tt.tx_n)

    # rays exactly as make_eye_pass builds them (cy unflipped)
    n_pix = w * band_rows
    lanes = -(-n_pix // 1024) * 1024
    lane_ids = np.arange(lanes)
    dx = rng.random(lanes).astype(np.float32)
    dy = rng.random(lanes).astype(np.float32)
    cx = ((lane_ids % w) + dx) * np.float32(1.0 / w)
    cy = ((lane_ids // w) + dy) * np.float32(1.0 / h)
    d = np.asarray(cam.ray_dirs(jnp.asarray(cx), jnp.asarray(cy)))

    d_tiles = d[src_lane]  # ((n_tiles+1)*1024, 3)
    d_rows = jnp.asarray(d_tiles.T.reshape(3, (n_tiles + 1) * ttk.BLOCK_ROWS,
                                           ttk.LANES))
    cs, ct, cf = (jnp.asarray(x) for x in bands[0])
    t_k, u_k, v_k, i_k = ttk.intersect_tile_tris_pallas(
        jnp.asarray(tt.table), cs, ct, cf, d_rows, n_tiles, interpret=True)
    flat = lambda o: np.asarray(o).reshape(-1)[back]
    t_k, u_k, v_k, i_k = flat(t_k), flat(u_k), flat(v_k), flat(i_k)
    hit_k = t_k < float(ttk.BIG)

    tc = tri_ops.pack_for_intersect(jnp.asarray(a), jnp.asarray(e1),
                                    jnp.asarray(e2),
                                    jnp.ones(len(a), bool))
    org = jnp.zeros((lanes, 3), jnp.float32)
    t_o, i_o, hit_o = tri_ops.intersect_tris(tc, org, jnp.asarray(d))
    t_o, i_o, hit_o = np.asarray(t_o), np.asarray(i_o), np.asarray(hit_o)

    np.testing.assert_array_equal(hit_k, hit_o)
    np.testing.assert_array_equal(i_k[hit_k], i_o[hit_o])
    # same formula, different expression graphs: XLA's fma contraction may
    # differ, so t agrees to ~ulp, not bitwise
    np.testing.assert_allclose(t_k[hit_k], t_o[hit_o], rtol=5e-6)

    # barycentrics match the per-winner recompute (same formula family)
    tw, uw, vw = tri_ops.mt_single(jnp.asarray(a)[i_o], jnp.asarray(e1)[i_o],
                                   jnp.asarray(e2)[i_o], org, jnp.asarray(d))
    np.testing.assert_allclose(u_k[hit_k], np.asarray(uw)[hit_o], atol=5e-5)
    np.testing.assert_allclose(v_k[hit_k], np.asarray(vw)[hit_o], atol=5e-5)


def test_tile_cull_counts_are_conservative():
    """Every triangle hittable by some ray of a tile must be in that tile's
    list (checked against a dense per-pixel-corner ray sweep)."""
    rng = np.random.default_rng(3)
    w = h = 64
    cam = Camera.create(eye=(0, 0, 0), target=(0, 0, -1), up=(0, 1, 0),
                        aspect=1.0, vertical_fov_deg=45.0)
    a, e1, e2 = _random_tris(300, rng)
    tt = ttk.build_tile_tri_table(cam, a, e1, e2, w, h)

    # dense oracle: rays at pixel centers, map each hit tri to its tile
    ys, xs = np.mgrid[0:h, 0:w]
    cx = (xs.ravel() + 0.5) / w
    cy = (ys.ravel() + 0.5) / h
    d = np.asarray(cam.ray_dirs(jnp.asarray(cx, jnp.float32),
                                jnp.asarray(cy, jnp.float32)))
    tc = tri_ops.pack_for_intersect(jnp.asarray(a), jnp.asarray(e1),
                                    jnp.asarray(e2), jnp.ones(len(a), bool))
    t_o, i_o, hit_o = tri_ops.intersect_tris(
        tc, jnp.zeros((w * h, 3), jnp.float32), jnp.asarray(d))
    hit_o = np.asarray(hit_o)
    i_o = np.asarray(i_o)
    tile_of = (ys.ravel() // ttk.TILE) * tt.tx_n + xs.ravel() // ttk.TILE
    for t in range(tt.tx_n * tt.ty_n):
        s0, s1 = tt.tile_chunk_start[t] * ttk.CHUNK, \
            tt.tile_chunk_start[t + 1] * ttk.CHUNK
        # zero-pad columns carry idx 0; only trust columns with real data
        nz = np.abs(tt.table[0:9, s0:s1]).sum(0) > 0
        listed = set(tt.table[9, s0:s1][nz].astype(int))
        need = set(i_o[(tile_of == t) & hit_o].tolist())
        assert need <= listed, (t, need - listed)


def test_ppm_tile_primary_matches_walk(tmp_path):
    """Full tiny-ganesha PPM render with the tile-culled primary kernel vs
    the BVH walk: same eye-pass geometry up to MT op-order ulps."""
    import os

    from tools.make_test_mesh import uv_sphere
    from pathtracer_tpu.io import ply
    from pathtracer_tpu.models import ganesha
    from pathtracer_tpu.ppm import PPMRenderer

    verts, faces = uv_sphere(12, 8, np.array([328.0, 60.0, 150.0]), 45.0)
    path = os.path.join(str(tmp_path), "tiny_ganesha.ply")
    ply.write_mesh(path, verts, faces)
    imgs = []
    for tile_primary in (False, True):
        scene, cam, lights, mesh, bbox = ganesha.build(path, 1.0)
        rend = PPMRenderer(scene, cam, lights, 64, 64, iterations=1,
                           photon_count=1000, max_bounces=3, verbose=False,
                           mesh=mesh, bbox_override=bbox,
                           tile_primary=tile_primary)
        imgs.append(rend.render())
    walk_img, tile_img = imgs
    assert np.isfinite(tile_img).all() and tile_img.max() > 0
    # the two intersectors agree on every winner (idx 100%, t to ~1e-6 rel,
    # measured); the residual is hit-point ulps rippling through continuous
    # cone-filter weights, so the images differ at the 1e-5 level on a
    # multi-unit radiance scale
    np.testing.assert_allclose(tile_img, walk_img, rtol=1e-3, atol=1e-4)


def test_pt_tile_primary_matches_walk(tmp_path):
    """Path-traced mesh pass (tiled composite tier) with the tile-culled
    bounce-0 kernel vs the BVH walk at every bounce: same radiance up to
    MT op-order ulps, same segment count (the conservative cull + the
    shared MT acceptance rule cannot change any winner)."""
    import os

    import jax

    from tools.make_test_mesh import uv_sphere
    from pathtracer_tpu.io import ply
    from pathtracer_tpu.models import ganesha
    from pathtracer_tpu.integrator import make_pass_fn

    verts, faces = uv_sphere(12, 8, np.array([328.0, 60.0, 150.0]), 45.0)
    path = os.path.join(str(tmp_path), "tiny_ganesha.ply")
    ply.write_mesh(path, verts, faces)
    scene, cam, bg, mesh = ganesha.build_pt(path, 1.0)
    W, H, SPP, B = 64, 64, 1, 4
    consts = mesh.device_consts()
    outs = []
    for knob in ("0", "1"):
        os.environ["PATHTRACER_PT_TILE_TRI"] = knob
        try:
            pf = make_pass_fn(cam, bg, W, H, SPP, B,
                              backend="pallas2_interpret", tiled=True,
                              mesh=mesh)
            arrs = pf.tile_tri_arrays()
            assert (arrs is not None) == (knob == "1")
            tt = (tuple(jnp.asarray(x) for x in arrs)
                  if arrs is not None else None)
            rad, segs = pf(scene, 0, mesh_consts=consts, tile_tri=tt)
        finally:
            os.environ.pop("PATHTRACER_PT_TILE_TRI", None)
        outs.append((np.asarray(rad), int(segs)))
    (img_w, segs_w), (img_t, segs_t) = outs
    assert np.isfinite(img_t).all() and img_t.max() > 0
    assert segs_t == segs_w
    np.testing.assert_allclose(img_t, img_w, rtol=1e-3, atol=1e-4)


def test_bvh_cull_is_conservative_superset_of_brute():
    """The BVH-guided tile cull (native.tile_cull_native) must accept a
    SUPERSET of the brute-force sgemm accepts per tile (any conservative
    superset keeps the kernel's strict-< argmin bit-identical), and stay
    tight (no blow-up)."""
    from pathtracer_tpu.camera import Camera
    from pathtracer_tpu.native import get_lib
    from pathtracer_tpu.ops.bvh import MeshBVH

    if get_lib() is None:
        import pytest
        pytest.skip("native toolchain unavailable")

    rs = np.random.RandomState(11)
    verts = rs.uniform(-4, 4, (200, 3)).astype(np.float32)
    faces = rs.randint(0, 200, (600, 3))
    faces = faces[(faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
                  & (faces[:, 0] != faces[:, 2])]
    mat = np.zeros(12, np.float32)
    mesh = MeshBVH(verts, faces, mat, walk="octant")
    cam = Camera.create(eye=(9, 2, 5), target=(0, 0, 0), up=(0, 1, 0),
                        aspect=1.5, vertical_fov_deg=40.0)
    W, H = 192, 128

    def tile_sets(tt):
        out = []
        for t in range(tt.tx_n * tt.ty_n):
            s0 = int(tt.tile_chunk_start[t]) * ttk.CHUNK
            s1 = int(tt.tile_chunk_start[t + 1]) * ttk.CHUNK
            real = np.any(tt.table[3:9, s0:s1] != 0, axis=0)
            out.append(set(np.unique(tt.table[9, s0:s1][real]).astype(int)))
        return out

    a, e1, e2 = mesh.tri_a, mesh.tri_e1, mesh.tri_e2
    brute = tile_sets(ttk.build_tile_tri_table(cam, a, e1, e2, W, H))
    bvh = tile_sets(ttk.build_tile_tri_table(cam, a, e1, e2, W, H,
                                             bvh=mesh))
    n_brute = sum(len(s) for s in brute)
    n_bvh = sum(len(s) for s in bvh)
    for t, (sb, sv) in enumerate(zip(brute, bvh)):
        assert sb <= sv, f"tile {t}: BVH cull dropped brute-accepted tris"
    assert n_bvh <= n_brute * 1.05 + 64, (n_bvh, n_brute)


def _octa_sphere(subdiv, center, radius):
    """Watertight sphere mesh: subdivided octahedron projected to the
    sphere; consistent outward winding."""
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float64)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    for _ in range(subdiv):
        verts = list(v)
        cache = {}

        def mid(i, j):
            k = (min(i, j), max(i, j))
            if k not in cache:
                m = v[i] + v[j]
                m /= np.linalg.norm(m)
                cache[k] = len(verts)
                verts.append(m)
            return cache[k]

        nf = []
        for a_, b_, c_ in f:
            ab, bc, ca = mid(a_, b_), mid(b_, c_), mid(c_, a_)
            nf += [[a_, ab, ca], [ab, b_, bc], [ca, bc, c_], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(nf)
    return (v * radius + center).astype(np.float32), f


def test_backface_cull_keeps_every_nearest_hit():
    """Back-face culled tile lists (watertight precondition) must still
    contain the brute-force nearest-hit triangle of every pixel ray, for
    BOTH winding orientations (the signed-volume sign detection), while
    actually dropping a large back-facing share."""
    w = h = 64
    cam = Camera.create(eye=(0, 0, 0), target=(0, 0, -1), up=(0, 1, 0),
                        aspect=1.0, vertical_fov_deg=50.0)
    verts, faces = _octa_sphere(3, np.array([0.0, 0.0, -4.0]), 1.6)
    for flip in (False, True):
        fc = faces[:, ::-1] if flip else faces
        a = verts[fc[:, 0]]
        e1 = verts[fc[:, 1]] - a
        e2 = verts[fc[:, 2]] - a
        full = ttk.build_tile_tri_table(cam, a, e1, e2, w, h)
        cull = ttk.build_tile_tri_table(cam, a, e1, e2, w, h,
                                        backface_cull=True)

        def tile_sets(tt):
            out = []
            for t in range(tt.tx_n * tt.ty_n):
                s0 = int(tt.tile_chunk_start[t]) * ttk.CHUNK
                s1 = int(tt.tile_chunk_start[t + 1]) * ttk.CHUNK
                real = np.any(tt.table[3:9, s0:s1] != 0, axis=0)
                out.append(set(np.unique(
                    tt.table[9, s0:s1][real]).astype(int)))
            return out

        full_sets, cull_sets = tile_sets(full), tile_sets(cull)
        n_full = sum(len(s) for s in full_sets)
        n_cull = sum(len(s) for s in cull_sets)
        assert n_cull < n_full * 0.75, (n_cull, n_full)
        for sc, sf in zip(cull_sets, full_sets):
            assert sc <= sf

        # brute nearest hit per pixel-center ray must survive the cull
        ys, xs = np.mgrid[0:h, 0:w]
        cx = (xs.ravel() + 0.5) / w
        cy = (ys.ravel() + 0.5) / h
        d = np.asarray(cam.ray_dirs(jnp.asarray(cx, jnp.float32),
                                    jnp.asarray(cy, jnp.float32)))
        tc = tri_ops.pack_for_intersect(jnp.asarray(a), jnp.asarray(e1),
                                        jnp.asarray(e2),
                                        jnp.ones(len(a), bool))
        org = jnp.zeros((len(d), 3), jnp.float32)
        _, i_o, hit_o = tri_ops.intersect_tris(tc, org, jnp.asarray(d))
        i_o, hit_o = np.asarray(i_o), np.asarray(hit_o)
        tx = xs.ravel() // ttk.TILE
        ty = ys.ravel() // ttk.TILE
        tid = ty * cull.tx_n + tx
        miss = [(int(t), int(i)) for t, i, hh in zip(tid, i_o, hit_o)
                if hh and int(i) not in cull_sets[int(t)]]
        assert not miss, miss[:10]

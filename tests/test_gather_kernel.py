"""Broadcast-gather kernel vs a brute-force cone-filter oracle."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops.pallas import gather_kernel as gk


def _brute_force(point, normal, active, pos, nrm, flux, valid, r):
    """O(hits x photons) reference of the cone-filter sum."""
    out = np.zeros((len(point), 3), np.float32)
    for i in range(len(point)):
        if not active[i]:
            continue
        d = pos - point[i]
        d2 = (d * d).sum(1)
        ndot = (nrm * normal[i]).sum(1)
        ok = valid & (d2 < r * r) & (ndot > 1e-3)
        w = 1.0 - np.sqrt(d2) / r
        out[i] = (flux[ok] * w[ok, None]).sum(0)
    return out


def _setup(rng, n_hits, n_pho, r):
    lo = np.zeros(3, np.float32)
    point = rng.random((n_hits, 3)).astype(np.float32)
    normal = rng.standard_normal((n_hits, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    active = rng.random(n_hits) < 0.9
    pos = rng.random((n_pho, 3)).astype(np.float32)
    nrm = rng.standard_normal((n_pho, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    flux = rng.random((n_pho, 3)).astype(np.float32)
    valid = rng.random(n_pho) < 0.95
    return lo, point, normal, active, pos, nrm, flux, valid


def test_gather_kernel_matches_bruteforce():
    rng = np.random.default_rng(0)
    r = 0.06
    n_hits, n_pho = 1024, 3000
    lo, point, normal, active, pos, nrm, flux, valid = _setup(
        rng, n_hits, n_pho, r)
    cell = np.float32(max(r, 1.0 / gk.SIDE))
    tbl, start, count = gk.build_photon_grid_morton(
        jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(flux),
        jnp.asarray(valid), jnp.asarray(lo), cell)
    s_tab, e_tab, own = gk.query_tables(jnp.asarray(point),
                                        jnp.asarray(active),
                                        jnp.asarray(lo), cell, start, count)
    got = gk.gather_flux_pallas(jnp.asarray(point), jnp.asarray(normal),
                                s_tab, e_tab, tbl, np.float32(r),
                                interpret=True)
    want = _brute_force(point, normal, active, pos, nrm, flux, valid, r)
    got = np.array(got)
    got[~active] = 0.0  # inactive lanes have empty ranges, but be explicit
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_device_side_grid_build_matches_bruteforce():
    """ppm._build_grid_morton_device (grid origin/cell computed ON DEVICE,
    no host pulls) must produce the same exact gather as the brute-force
    oracle — the f32 origin shift only re-buckets, never drops candidates."""
    from pathtracer_tpu.ppm import _build_grid_morton_device

    rng = np.random.default_rng(3)
    r = 0.07
    n_hits, n_pho = 1024, 2000
    _, point, normal, active, pos, nrm, flux, valid = _setup(
        rng, n_hits, n_pho, r)
    tbl, start, count, glo, cell = _build_grid_morton_device(
        jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(flux),
        jnp.asarray(valid), jnp.float32(r))
    s_tab, e_tab, own = gk.query_tables(jnp.asarray(point),
                                        jnp.asarray(active), glo, cell,
                                        start, count)
    got = gk.gather_flux_pallas(jnp.asarray(point), jnp.asarray(normal),
                                s_tab, e_tab, tbl, np.float32(r),
                                interpret=True)
    want = _brute_force(point, normal, active, pos, nrm, flux, valid, r)
    got = np.array(got)
    got[~active] = 0.0
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_hash_gather_dedupes_colliding_buckets():
    """Regression: two different neighbor cells hashing to the same bucket
    must not double-count its photons. With a 256-entry table collisions are
    common; the walk must still match brute force exactly."""
    from pathtracer_tpu.ppm import build_photon_grid, hash_gather

    rng = np.random.default_rng(3)
    r = 0.08
    n_pho, n_hit, m = 4000, 512, 256
    lo, point, normal, active, pos, nrm, flux, valid = _setup(
        rng, n_hit, n_pho, r)
    order, start, count = build_photon_grid(
        jnp.asarray(pos), jnp.asarray(valid), jnp.float32(r), m=m)
    grid = (order, start, count, jnp.asarray(pos), jnp.asarray(nrm),
            jnp.asarray(flux), jnp.asarray(valid))
    got = np.asarray(hash_gather(jnp.asarray(point), jnp.asarray(normal),
                                 jnp.asarray(active), jnp.float32(r), grid,
                                 grid_m=m, dep_lanes=n_pho, chunk=512))
    want = _brute_force(point, normal, active, pos, nrm, flux, valid, r)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_chunk_gather_matches_bruteforce():
    """The adaptive chunk-bbox gather (production tier) vs the brute-force
    oracle — including far outlier photons, which break the dense raster
    grid's cell sizing (ganesha's lit floor spreads deposits over ~9,600
    units) but are exactly what the chunk bboxes prune."""
    rng = np.random.default_rng(0)
    r = 0.06
    n_hits, n_pho = 2048, 3000
    _, point, normal, active, pos, nrm, flux, valid = _setup(
        rng, n_hits, n_pho, r)
    pos = pos.copy()
    pos[::17] += 40.0  # sparse far outliers stretch the deposit bbox
    tbl, sbox = gk.build_photon_chunks(
        jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(flux),
        jnp.asarray(valid))
    got = np.asarray(gk.gather_flux_chunks_pallas(
        jnp.asarray(point), jnp.asarray(normal), jnp.asarray(active),
        sbox, tbl, np.float32(r), interpret=True))
    want = _brute_force(point, normal, active, pos, nrm, flux, valid, r)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert (got[~active] == 0.0).all()


def test_chunk_gather_hits_near_outliers():
    """Hits placed next to the far outlier photons must still gather them
    (the chunk design has no grid boundary to fall off)."""
    rng = np.random.default_rng(2)
    r = 0.08
    n_hits, n_pho = 1024, 2000
    _, point, normal, active, pos, nrm, flux, valid = _setup(
        rng, n_hits, n_pho, r)
    pos = pos.copy()
    pos[:50] += 40.0
    point = point.copy()
    point[:100] = pos[:50].repeat(2, axis=0) + rng.standard_normal(
        (100, 3)).astype(np.float32) * (r / 4)
    tbl, sbox = gk.build_photon_chunks(
        jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(flux),
        jnp.asarray(valid))
    got = np.asarray(gk.gather_flux_chunks_pallas(
        jnp.asarray(point), jnp.asarray(normal), jnp.asarray(active),
        sbox, tbl, np.float32(r), interpret=True))
    want = _brute_force(point, normal, active, pos, nrm, flux, valid, r)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert want[:100][active[:100]].sum() > 0  # oracle sees the outliers


def test_chunk_gather_no_valid_photons():
    """All-invalid deposits: every chunk bbox is inverted, no block streams
    anything, every lane returns zero."""
    rng = np.random.default_rng(4)
    r = 0.06
    _, point, normal, active, pos, nrm, flux, _ = _setup(
        rng, 1024, 500, r)
    valid = np.zeros(500, bool)
    tbl, sbox = gk.build_photon_chunks(
        jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(flux),
        jnp.asarray(valid))
    got = np.asarray(gk.gather_flux_chunks_pallas(
        jnp.asarray(point), jnp.asarray(normal), jnp.asarray(active),
        sbox, tbl, np.float32(r), interpret=True))
    assert (got == 0.0).all()


def test_gather_kernel_hit_outside_grid():
    """Eye hits outside the deposit bbox (e.g. the lit floor's far reaches)
    must gather nothing rather than alias into boundary cells."""
    rng = np.random.default_rng(1)
    r = 0.05
    lo, point, normal, active, pos, nrm, flux, valid = _setup(
        rng, 1024, 500, r)
    point[:512] += 50.0  # far outside the unit-box photon cloud
    cell = np.float32(max(r, 1.0 / gk.SIDE))
    tbl, start, count = gk.build_photon_grid_morton(
        jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(flux),
        jnp.asarray(valid), jnp.asarray(lo), cell)
    s_tab, e_tab, own = gk.query_tables(jnp.asarray(point),
                                        jnp.asarray(active),
                                        jnp.asarray(lo), cell, start, count)
    got = np.asarray(gk.gather_flux_pallas(
        jnp.asarray(point), jnp.asarray(normal), s_tab, e_tab, tbl,
        np.float32(r), interpret=True))
    assert (got[:512] == 0.0).all()
    want = _brute_force(point, normal, active, pos, nrm, flux, valid, r)
    np.testing.assert_allclose(got[512:], want[512:], rtol=2e-4, atol=2e-5)


def test_gather_kernel_hit_one_cell_outside_edge():
    """A hit in cell -1 (just outside the deposit bbox) must still gather
    in-radius photons from edge cell 0 — the reference gathers by distance
    (ppm.ml:344-371), not by grid membership. Exercises the raster-range
    x-clamp at both ends."""
    r = 0.05
    cell = np.float32(max(r, 1.0 / gk.SIDE))
    lo = np.zeros(3, np.float32)
    # photons hugging the low-x face and the high-x face, inside the grid
    pos = np.array([[0.01, 0.5, 0.5], [1.0 / gk.SIDE * gk.SIDE - 0.001,
                                       0.5, 0.5]], np.float32)
    pos = np.repeat(pos, 4, axis=0)
    nrm = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (8, 1))
    flux = np.ones((8, 3), np.float32)
    valid = np.ones(8, bool)
    # hits just OUTSIDE each face, within the gather radius of the photons
    point = np.zeros((1024, 3), np.float32)
    point[:, 1:] = 0.5
    point[0::2, 0] = -0.02       # cell -1 on the low side
    point[1::2, 0] = pos[-1, 0] + 0.02  # one cell past the high side
    normal = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (1024, 1))
    active = np.ones(1024, bool)
    tbl, start, count = gk.build_photon_grid_morton(
        jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(flux),
        jnp.asarray(valid), jnp.asarray(lo), cell)
    s_tab, e_tab, own = gk.query_tables(jnp.asarray(point),
                                        jnp.asarray(active),
                                        jnp.asarray(lo), cell, start, count)
    got = np.asarray(gk.gather_flux_pallas(
        jnp.asarray(point), jnp.asarray(normal), s_tab, e_tab, tbl,
        np.float32(r), interpret=True))
    want = _brute_force(point, normal, active, pos, nrm, flux, valid, r)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert want.sum() > 0  # the oracle must actually see those photons

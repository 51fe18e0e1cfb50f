import numpy as np
import jax.numpy as jnp

from pathtracer_tpu import film


def test_binomial_kernel_order5_radius1_exact():
    # exact rational resample of binomial(5) onto width 3:
    # unnormalized [11/3, 26/3, 11/3] -> [11/48, 26/48, 11/48]
    k = film.binomial_kernel_1d(order=5, pixel_radius=1)
    np.testing.assert_allclose(k, [11 / 48, 26 / 48, 11 / 48], rtol=0, atol=0)


def test_binomial_kernel_sums_to_one():
    for order, r in [(5, 1), (5, 2), (3, 1), (7, 3), (2, 0)]:
        k2 = film.binomial_kernel_2d(order, r)
        assert abs(k2.sum() - 1.0) < 1e-12


def test_apply_filter_matches_explicit_splat():
    """Conv-based reconstruction == the reference's per-sample stencil splat
    with out-of-image taps dropped (film_tile.ml:23-38 + stitch bounds)."""
    rs = np.random.RandomState(1)
    h, w = 13, 17
    sums = rs.uniform(size=(h, w, 3)).astype(np.float32)
    k2 = film.binomial_kernel_2d(5, 1)
    want = np.zeros_like(sums)
    for y in range(h):
        for x in range(w):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w:
                        want[yy, xx] += k2[dy + 1, dx + 1] * sums[y, x]
    got = np.asarray(film.apply_filter(jnp.asarray(sums), k2))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_finalize_gamma():
    sums = jnp.asarray(np.full((4, 4, 3), 8.0, np.float32))
    img = np.asarray(film.finalize(sums, samples_per_pixel=32))
    np.testing.assert_allclose(img, 0.5, rtol=1e-6)

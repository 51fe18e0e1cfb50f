import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops.spheres import intersect_brute


def _scene(centers, radii):
    c = jnp.asarray(centers, jnp.float32)
    r = jnp.asarray(radii, jnp.float32)
    return c, r, jnp.ones(c.shape[0], bool)


def test_head_on_hit():
    c, r, v = _scene([[0.0, 0.0, -5.0]], [1.0])
    org = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx, hit = intersect_brute(c, r, v, org, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 4.0, rtol=1e-6)


def test_miss():
    c, r, v = _scene([[0.0, 0.0, -5.0]], [1.0])
    org = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    _, _, hit = intersect_brute(c, r, v, org, d)
    assert not bool(hit[0])


def test_inside_sphere_hits_far_wall():
    c, r, v = _scene([[0.0, 0.0, 0.0]], [2.0])
    org = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, _, hit = intersect_brute(c, r, v, org, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)


def test_nearest_of_many():
    c, r, v = _scene([[0, 0, -10], [0, 0, -4], [0, 0, -7]], [1, 1, 1])
    org = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx, hit = intersect_brute(c, r, v, org, d)
    assert bool(hit[0]) and int(idx[0]) == 1
    np.testing.assert_allclose(float(t[0]), 3.0, rtol=1e-6)


def test_t_range_respected():
    c, r, v = _scene([[0.0, 0.0, -5.0]], [1.0])
    org = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    # reference bbox-test style: t_max just below/above the hit distance
    _, _, hit_lo = intersect_brute(c, r, v, org, d, t_max=3.99)
    _, _, hit_hi = intersect_brute(c, r, v, org, d, t_max=4.01)
    assert not bool(hit_lo[0]) and bool(hit_hi[0])


def test_invalid_padding_ignored():
    c = jnp.asarray([[0.0, 0.0, -5.0], [0.0, 0.0, -2.0]], jnp.float32)
    r = jnp.asarray([1.0, 1.0], jnp.float32)
    valid = jnp.asarray([True, False])
    org = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx, hit = intersect_brute(c, r, valid, org, d)
    assert bool(hit[0]) and int(idx[0]) == 0


def test_matches_float64_reference_formula():
    """Against a straight float64 transliteration of sphere.ml:35-54."""
    rs = np.random.RandomState(5)
    S, N = 32, 64
    centers = rs.uniform(-10, 10, (S, 3))
    radii = rs.uniform(0.2, 3.0, S)
    org = rs.uniform(-10, 10, (N, 3))
    d = rs.randn(N, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    def ref_one(o, dd):
        best_t, best_i = np.inf, -1
        for i in range(S):
            f = centers[i] - o
            a = dd @ dd
            bp = f @ dd
            r2 = radii[i] ** 2
            discrim = r2 - ((dd * (bp / a) - f) ** 2).sum()
            if discrim < 0:
                continue
            sign = 1.0 if bp >= 0 else -1.0
            q = sign * np.sqrt(a * discrim) + bp
            c = f @ f - r2
            t = c / q if c > 0 else q / a
            if 0.0 <= t <= 1e30 and t < best_t:
                best_t, best_i = t, i
        return best_t, best_i

    t, idx, hit = intersect_brute(
        jnp.asarray(centers, jnp.float32), jnp.asarray(radii, jnp.float32),
        jnp.ones(S, bool), jnp.asarray(org, jnp.float32),
        jnp.asarray(d, jnp.float32))
    for n in range(N):
        want_t, want_i = ref_one(org[n], d[n])
        if want_i < 0:
            assert not bool(hit[n])
        else:
            assert bool(hit[n])
            assert int(idx[n]) == want_i
            np.testing.assert_allclose(float(t[n]), want_t, rtol=2e-3)

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops import quat, shading, vec


def rand(*shape):
    return jnp.asarray(np.random.RandomState(sum(shape)).randn(*shape), jnp.float32)


def test_cross_orthogonality():
    a, b = rand(64, 3), rand(64, 3)
    c = vec.cross(a, b)
    assert np.abs(np.asarray(vec.dot(c, a))).max() < 1e-4
    assert np.abs(np.asarray(vec.dot(c, b))).max() < 1e-4


def test_normalize_unit():
    a = rand(128, 3)
    n = np.asarray(vec.quadrance(vec.normalize(a)))
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_quat_rotate_preserves_length_and_composes():
    axis = rand(32, 3)
    ang = jnp.asarray(np.random.RandomState(7).uniform(0, np.pi, 32), jnp.float32)
    q = quat.from_axis_angle(axis, ang)
    v = rand(32, 3)
    rv = quat.rotate(q, v)
    np.testing.assert_allclose(np.asarray(vec.quadrance(rv)),
                               np.asarray(vec.quadrance(v)), rtol=1e-4)
    # rotate then rotate_inv is identity
    back = quat.rotate_inv(q, rv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-4)


def test_quat_mul_matches_sequential_rotation():
    q1 = quat.from_axis_angle(rand(8, 3), jnp.asarray(np.ones(8) * 0.7, jnp.float32))
    q2 = quat.from_axis_angle(rand(8, 3) + 1.0, jnp.asarray(np.ones(8) * 1.3, jnp.float32))
    v = rand(8, 3)
    a = quat.rotate(quat.mul(q1, q2), v)
    b = quat.rotate(q1, quat.rotate(q2, v))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_shader_quat_maps_normal_to_z():
    n = vec.normalize(rand(256, 3))
    q = shading.shader_quat(n)
    local = quat.rotate(q, n)
    want = np.tile([0.0, 0.0, 1.0], (256, 1))
    np.testing.assert_allclose(np.asarray(local), want, atol=1e-4)


def test_shader_quat_degenerate_poles():
    n = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], jnp.float32)
    q = shading.shader_quat(n)
    local = quat.rotate(q, n)
    np.testing.assert_allclose(np.asarray(local),
                               [[0, 0, 1], [0, 0, 1]], atol=1e-6)


def test_hemisphere_sample_unit_and_cosine_distributed():
    # property test mirror of path_tracer_test.ml:132-141
    rs = np.random.RandomState(3)
    u = jnp.asarray(rs.uniform(size=100), jnp.float32)
    v = jnp.asarray(rs.uniform(size=100), jnp.float32)
    w = shading.cosine_hemisphere(u, v)
    np.testing.assert_allclose(np.asarray(vec.quadrance(w)), 1.0, atol=1e-5)
    assert (np.asarray(w[..., 2]) >= 0).all()

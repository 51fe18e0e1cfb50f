import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.camera import Camera


def _cam():
    return Camera.create(eye=(13.0, 2.0, 4.5), target=(0.0, 0.0, 0.0),
                         up=(0.0, 1.0, 0.0), aspect=2.0, vertical_fov_deg=20.0)


def test_eye_maps_to_origin():
    cam = _cam()
    np.testing.assert_allclose(cam.transform_points(np.array([[13.0, 2.0, 4.5]])),
                               0.0, atol=1e-12)


def test_target_on_negative_z():
    cam = _cam()
    p = cam.transform_points(np.array([[0.0, 0.0, 0.0]]))[0]
    assert abs(p[0]) < 1e-12 and abs(p[1]) < 1e-12
    dist = np.linalg.norm([13.0, 2.0, 4.5])
    np.testing.assert_allclose(p[2], -dist, rtol=1e-12)


def test_transform_preserves_distances():
    cam = _cam()
    rs = np.random.RandomState(0)
    a, b = rs.randn(10, 3), rs.randn(10, 3)
    d0 = np.linalg.norm(a - b, axis=1)
    d1 = np.linalg.norm(cam.transform_points(a) - cam.transform_points(b), axis=1)
    np.testing.assert_allclose(d0, d1, rtol=1e-10)


def test_center_ray_is_minus_z():
    cam = _cam()
    d = np.asarray(cam.ray_dirs(jnp.asarray([0.5]), jnp.asarray([0.5])))[0]
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)


def test_fov_edges():
    cam = Camera.create(eye=(0, 0, 0), target=(0, 0, -1), up=(0, 1, 0),
                        aspect=1.0, vertical_fov_deg=90.0)
    top = np.asarray(cam.ray_dirs(jnp.asarray([0.5]), jnp.asarray([1.0])))[0]
    # at cy=1 the direction hits the top of a 90deg frustum: y/z = tan(45) = 1
    np.testing.assert_allclose(top[1] / -top[2], 1.0, rtol=1e-5)

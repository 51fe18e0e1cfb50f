import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.camera import Camera
from pathtracer_tpu.integrator import make_render_fn
from pathtracer_tpu.ops import triangles as tri_ops
from pathtracer_tpu.scene import LAMBERTIAN, METAL, SceneBuilder, TEX_CHECKER


def _pack(verts):
    verts = np.asarray(verts, np.float32)  # (T, 3, 3)
    a = verts[:, 0]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    return tri_ops.pack_for_intersect(jnp.asarray(a), jnp.asarray(e1),
                                      jnp.asarray(e2),
                                      jnp.ones(len(verts), bool))


def test_head_on_triangle_hit():
    tc = _pack([[[-1, -1, -5], [1, -1, -5], [0, 1, -5]]])
    org = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx, hit = tri_ops.intersect_tris(tc, org, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 5.0, rtol=1e-6)


def test_miss_outside_edges():
    tc = _pack([[[-1, -1, -5], [1, -1, -5], [0, 1, -5]]])
    org = jnp.asarray([[0.9, 0.9, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    _, _, hit = tri_ops.intersect_tris(tc, org, d)
    assert not bool(hit[0])


def test_parallel_ray_misses():
    tc = _pack([[[-1, -1, -5], [1, -1, -5], [0, 1, -5]]])
    org = jnp.zeros((1, 3))
    d = jnp.asarray([[1.0, 0.0, 0.0]])  # parallel to the plane
    _, _, hit = tri_ops.intersect_tris(tc, org, d)
    assert not bool(hit[0])


def test_nearest_of_two():
    tc = _pack([
        [[-1, -1, -7], [1, -1, -7], [0, 1, -7]],
        [[-1, -1, -3], [1, -1, -3], [0, 1, -3]],
    ])
    org = jnp.zeros((1, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, idx, hit = tri_ops.intersect_tris(tc, org, d)
    assert bool(hit[0]) and int(idx[0]) == 1
    np.testing.assert_allclose(float(t[0]), 3.0, rtol=1e-6)


def test_barycentric_recompute():
    verts = np.asarray([[[0, 0, -2], [2, 0, -2], [0, 2, -2]]], np.float32)
    a = jnp.asarray(verts[:, 0])
    e1 = jnp.asarray(verts[:, 1] - verts[:, 0])
    e2 = jnp.asarray(verts[:, 2] - verts[:, 0])
    org = jnp.asarray([[0.5, 0.25, 0.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, u, v = tri_ops.mt_single(a, e1, e2, org, d)
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(u[0]), 0.25, atol=1e-6)
    np.testing.assert_allclose(float(v[0]), 0.125, atol=1e-6)


def test_mixed_scene_renders_triangle_occluding_sphere():
    cam = Camera.create(eye=(0, 0, 5), target=(0, 0, 0), up=(0, 1, 0),
                        aspect=1.0, vertical_fov_deg=60.0)
    b = SceneBuilder()
    b.add_sphere((0, 0, -1), 1.0, METAL, color_a=(0.9, 0.1, 0.1))
    # big lambertian triangle in front of the sphere
    b.add_triangle((-3, -3, 1), (3, -3, 1), (0, 4, 1), LAMBERTIAN,
                   color_a=(0.1, 0.8, 0.1))
    scene = b.build(camera=cam)

    def bg(dd):
        return jnp.broadcast_to(jnp.asarray([1.0, 1.0, 1.0]), dd.shape)

    render = make_render_fn(cam, bg, 16, 16, 8, 4)
    img, _ = render(scene)
    img = np.asarray(img)
    center = img[8, 8]
    # the green triangle dominates the center pixel: green channel highest
    assert center[1] > center[0] and center[1] > center[2]


def test_checkered_quad():
    cam = Camera.create(eye=(0.5, 0.5, 2), target=(0.5, 0.5, 0), up=(0, 1, 0),
                        aspect=1.0, vertical_fov_deg=45.0)
    b = SceneBuilder()
    b.add_quad((0, 0, 0), (1, 0, 0), (0, 1, 0), mat_kind=LAMBERTIAN,
               color_a=(1, 0, 0), color_b=(0, 0, 1), tex_kind=TEX_CHECKER,
               checker_wh=(3, 3))
    scene = b.build(camera=cam)

    def bg(dd):
        return jnp.ones(dd.shape)

    render = make_render_fn(cam, bg, 32, 32, 8, 8)
    img, _ = render(scene)
    img = np.asarray(img)
    # quad tex-u runs along world +y, tex-v along world +x (quad corner
    # mapping, cornell-box/bin/main.ml:40-47); checker 3x3 -> parity flips
    # at 0.5. Top-left image quadrant = odd (blue), bottom-left = even (red).
    top_left = img[8, 8]
    bottom_left = img[24, 8]
    assert top_left[2] > top_left[0], top_left
    assert bottom_left[0] > bottom_left[2], bottom_left

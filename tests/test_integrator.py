import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.camera import Camera
from pathtracer_tpu.integrator import make_render_fn, render_with_progress
from pathtracer_tpu.scene import (DIELECTRIC, LAMBERTIAN, METAL, SceneBuilder,
                                  TEX_CHECKER)


def _flat_cam():
    return Camera.create(eye=(0, 0, 5), target=(0, 0, 0), up=(0, 1, 0),
                         aspect=1.0, vertical_fov_deg=60.0)


def _const_bg(color):
    c = np.asarray(color, np.float32)

    def bg(d):
        return jnp.broadcast_to(jnp.asarray(c), d.shape)

    return bg


def test_empty_scene_renders_background_exactly():
    cam = _flat_cam()
    b = SceneBuilder()
    b.add_sphere((0, 0, 1000.0), 0.0, LAMBERTIAN)  # zero-radius: never hit
    scene = b.build(camera=cam)
    render = make_render_fn(cam, _const_bg([0.25, 0.5, 0.75]), 16, 16, 4, 8)
    img, segs = render(scene)
    img = np.asarray(img)
    # every path escapes on bounce 0 -> radiance = bg; gamma sqrt applied.
    # Interior pixels get full filter weight; border pixels lose the
    # out-of-image stencil taps exactly like the reference's stitch bounds
    # check (integrator.ml:115-127), so they are dimmer by the dropped mass.
    want = np.sqrt([0.25, 0.5, 0.75])
    np.testing.assert_allclose(img[1:-1, 1:-1],
                               np.broadcast_to(want, (14, 14, 3)), rtol=1e-4)
    edge_w = 37.0 / 48.0  # 1-D kernel mass remaining at an image edge
    np.testing.assert_allclose(img[0, 0],
                               np.sqrt(np.array([0.25, 0.5, 0.75]) * edge_w ** 2),
                               rtol=1e-4)
    np.testing.assert_allclose(img[0, 8],
                               np.sqrt(np.array([0.25, 0.5, 0.75]) * edge_w),
                               rtol=1e-4)
    assert int(segs) == 16 * 16 * 4  # one segment per sample


def test_black_background_gives_black():
    cam = _flat_cam()
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, LAMBERTIAN, color_a=(0.8, 0.8, 0.8))
    scene = b.build(camera=cam)
    render = make_render_fn(cam, _const_bg([0, 0, 0]), 8, 8, 2, 4)
    img, _ = render(scene)
    np.testing.assert_allclose(np.asarray(img), 0.0, atol=1e-7)


def test_lambertian_sphere_darker_than_background():
    cam = _flat_cam()
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.5, LAMBERTIAN, color_a=(0.5, 0.5, 0.5))
    scene = b.build(camera=cam)
    render = make_render_fn(cam, _const_bg([1, 1, 1]), 32, 32, 8, 8)
    img, _ = render(scene)
    img = np.asarray(img)
    center = img[16, 16].mean()
    corner = img[2, 2].mean()  # interior pixel (border pixels are filter-dimmed)
    assert center < corner  # sphere absorbs energy, bg is full white
    np.testing.assert_allclose(corner, 1.0, atol=0.05)


def test_metal_mirror_preserves_background_energy():
    # a perfect white-metal mirror reflects the constant background -> image
    # equals background everywhere (up to the below-horizon absorb edge)
    cam = _flat_cam()
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, METAL, color_a=(1.0, 1.0, 1.0))
    scene = b.build(camera=cam)
    render = make_render_fn(cam, _const_bg([0.49, 0.49, 0.49]), 16, 16, 4, 8)
    img, _ = render(scene)
    center = np.asarray(img)[8, 8]
    np.testing.assert_allclose(center, 0.7, atol=0.02)  # sqrt(0.49)


def test_max_bounces_kills_paths():
    # mirror box: with 1 bounce a metal hit contributes nothing
    cam = _flat_cam()
    b = SceneBuilder()
    # big enough that the center pixel's whole filter stencil hits the sphere
    b.add_sphere((0, 0, 0), 2.0, METAL, color_a=(1.0, 1.0, 1.0))
    scene = b.build(camera=cam)
    render = make_render_fn(cam, _const_bg([1, 1, 1]), 8, 8, 1, 1)
    img, _ = render(scene)
    assert np.asarray(img)[4, 4].max() < 1e-6


def test_render_with_progress_matches_jit_render():
    cam = _flat_cam()
    b = SceneBuilder()
    b.add_sphere((0.3, 0, 0), 1.0, METAL, color_a=(0.9, 0.8, 0.7))
    b.add_sphere((-1.2, 0, 0.5), 0.7, LAMBERTIAN, color_a=(0.2, 0.4, 0.6))
    b.add_sphere((1.0, 1.0, -0.5), 0.5, DIELECTRIC)
    scene = b.build(camera=cam)
    bg = _const_bg([0.7, 0.8, 1.0])
    render = make_render_fn(cam, bg, 24, 24, 4, 6)
    img1, segs1 = render(scene)
    calls = []
    img2, segs2 = render_with_progress(cam, bg, scene, 24, 24, 4, 6,
                                       progress=calls.append)
    np.testing.assert_allclose(np.asarray(img1), img2, atol=1e-6)
    assert int(segs1) == segs2
    # progress updates are batched (8 passes/sync) but must still cover
    # every traced pixel exactly once
    assert sum(calls) == 4 * 24 * 24


def test_determinism():
    cam = _flat_cam()
    b = SceneBuilder()
    b.add_sphere((0, 0, 0), 1.0, DIELECTRIC)
    b.add_sphere((0, -100.8, 0), 100.0, LAMBERTIAN, color_a=(0.6, 0.55, 0.4),
                 color_b=(0.9, 0.9, 0.9), tex_kind=TEX_CHECKER,
                 checker_wh=(100, 200))
    scene = b.build(camera=cam)
    render = make_render_fn(cam, _const_bg([1, 0.9, 0.8]), 16, 16, 2, 8)
    a, _ = render(scene)
    b_, _ = render(scene)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

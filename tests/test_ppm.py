"""Progressive photon mapper tests (cornell box at toy size)."""

import numpy as np

from pathtracer_tpu.models import cornell
from pathtracer_tpu.ppm import Light, PPMRenderer, light_photon_counts


def test_light_photon_split_truncates():
    # truncation semantics of ppm.ml:262-270
    lights = [Light.spot((0, 0, 0), (0, 0, 1), power=10000.0),
              Light.spot((0, 0, 0), (0, 0, 1), power=3000.0)]
    counts, starts, total = light_photon_counts(lights, 75000)
    assert counts == [57692, 17307]
    assert starts == [0, 57692]
    assert total == 74999  # one photon is lost to truncation, like the ref


def test_radius_schedule():
    scene, cam, lights = cornell.build(1.0)
    r = PPMRenderer(scene, cam, lights, 100, 100, alpha=2.0 / 3.0)
    r1 = r.radius(1)
    r2 = r.radius(2)
    r3 = r.radius(3)
    assert r1 > r2 > r3
    # radius2(2) = (1+a)/1 * init/2
    np.testing.assert_allclose(r2 ** 2, (1 + 2 / 3) * r1 ** 2 / 2, rtol=1e-12)


def test_cornell_ppm_toy_render():
    scene, cam, lights = cornell.build(1.0)
    rend = PPMRenderer(scene, cam, lights, 64, 64, iterations=2,
                       photon_count=2000, max_bounces=4, verbose=False)
    img_sum = rend.render(output=None)
    img = img_sum / 2
    assert np.isfinite(img).all()
    assert img.max() > 0.01  # light reached the film
    # red wall on screen-right, blue on screen-left (camera x' = -world x)
    left = img[28:36, 4:12].mean(axis=(0, 1))
    right = img[28:36, 52:60].mean(axis=(0, 1))
    assert left[2] > left[0], left  # blue dominant on the left
    assert right[0] > right[2], right  # red dominant on the right


def test_ppm_deterministic():
    scene, cam, lights = cornell.build(1.0)
    kw = dict(iterations=1, photon_count=1000, max_bounces=3, verbose=False)
    a = PPMRenderer(scene, cam, lights, 32, 32, **kw).render()
    b = PPMRenderer(scene, cam, lights, 32, 32, **kw).render()
    np.testing.assert_array_equal(a, b)


def test_eye_walk_ladder_matches_uncompacted(monkeypatch):
    """The specular-walk lane-compaction ladder (argsort-pack after
    bounce 0 + static-prefix switch) must be BIT-exact vs the full-width
    walk: per-lane results are order-independent, compaction only changes
    which lanes the intersector kernels stream. 128x64 rows -> 8192 lanes,
    the ladder threshold."""
    scene, cam, lights = cornell.build(1.0)
    kw = dict(iterations=1, photon_count=1500, max_bounces=4,
              verbose=False)
    monkeypatch.setenv("PATHTRACER_PPM_EYE_COMPACT", "0")
    a = PPMRenderer(scene, cam, lights, 128, 64, **kw).render()
    monkeypatch.setenv("PATHTRACER_PPM_EYE_COMPACT", "1")
    b = PPMRenderer(scene, cam, lights, 128, 64, **kw).render()
    np.testing.assert_array_equal(a, b)


def test_ppm_checkpoint_resume(tmp_path):
    import os
    scene, cam, lights = cornell.build(1.0)
    kw = dict(iterations=2, photon_count=800, max_bounces=3, verbose=False)
    ck = os.path.join(tmp_path, "ck.npz")
    # full run
    want = PPMRenderer(scene, cam, lights, 24, 24, **kw).render()
    # run 1 iteration, "crash", resume for the second
    r1 = PPMRenderer(scene, cam, lights, 24, 24, iterations=1,
                     photon_count=800, max_bounces=3, verbose=False)
    r1.render(checkpoint_path=ck)
    got = PPMRenderer(scene, cam, lights, 24, 24, **kw).render(
        checkpoint_path=ck)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_device_film_accum_matches_host_f64():
    """The device-side Kahan-f32 film accumulator (engaged when no host
    consumer needs the per-iteration image) must match the host float64
    stitch path to f32-rounding accuracy over several iterations."""
    scene, cam, lights = cornell.build(1.0)
    kw = dict(iterations=3, photon_count=1200, max_bounces=4)
    dev = PPMRenderer(scene, cam, lights, 32, 32, verbose=False,
                      **kw).render()
    host = PPMRenderer(scene, cam, lights, 32, 32, verbose=True,
                       **kw).render()
    assert dev.dtype == np.float64 and host.dtype == np.float64
    np.testing.assert_allclose(dev, host, atol=5e-6, rtol=1e-5)


def test_scene_all_diffuse_detection():
    """The static eye-scan cap must only engage for specular-free scenes:
    cornell has metal+glass (full specular walk), the ganesha mesh is all
    lambertian (walk provably dead after the first hit)."""
    from pathtracer_tpu.models import cornell
    from pathtracer_tpu.ppm import scene_all_diffuse

    c_scene = cornell.build(1.0)[0]
    assert not scene_all_diffuse(c_scene)

    from pathtracer_tpu.scene import SceneBuilder
    b = SceneBuilder()
    b.add_sphere((0, 0, -3), 1.0, mat_kind=0, color_a=(0.5, 0.5, 0.5))
    assert scene_all_diffuse(b.build())
    b2 = SceneBuilder()
    b2.add_sphere((0, 0, -3), 1.0, mat_kind=1, color_a=(0.5, 0.5, 0.5))
    assert not scene_all_diffuse(b2.build())

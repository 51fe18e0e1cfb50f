import os

import numpy as np

from pathtracer_tpu.io.png import read_png, to_u8, write_png
from pathtracer_tpu.models import shirley
from pathtracer_tpu.scene import eval_texture
import jax.numpy as jnp


def test_png_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    img = rs.uniform(size=(23, 31, 3))
    path = os.path.join(tmp_path, "t.png")
    write_png(path, img)
    back = read_png(path)
    np.testing.assert_array_equal(back, to_u8(img))


def test_to_u8_truncates():
    # parity with the reference's float->byte conversion (see io/png.py)
    x = np.array([[[0.9999999, 1.0, 0.5019]]])
    assert list(to_u8(x)[0, 0]) == [254, 255, 127]


def test_shirley_scene_structure():
    spheres = shirley.generate_sphere_list(42)
    # ground + 3 big + small grid survivors
    assert spheres[0]["kind"] == "checker_lambert"
    assert [s["kind"] for s in spheres[1:4]] == ["glass", "metal", "lambert"]
    smalls = spheres[4:]
    assert 400 < len(smalls) < 529
    kinds = {k: sum(1 for s in smalls if s["kind"] == k) for k in
             ("lambert", "metal", "glass")}
    # 80/15/5 mix, loose bounds
    assert kinds["lambert"] > 0.7 * len(smalls)
    assert kinds["metal"] > 0.07 * len(smalls)
    assert kinds["glass"] >= 1
    for s in smalls:
        assert abs(s["center"][1] - 0.2) < 1e-12
        # exclusion zone around (4, 0.2, 0)
        dx = s["center"][0] - 4.0
        dz = s["center"][2]
        assert dx * dx + dz * dz > 0.81


def test_checker_texture_parity():
    # u in first cell, v in first cell -> even color
    ca = jnp.asarray([[0.1, 0.2, 0.3]])
    cb = jnp.asarray([[0.9, 0.9, 0.9]])
    kind = jnp.asarray([1])
    w = jnp.asarray([999.0])
    h = jnp.asarray([1999.0])
    even = np.asarray(eval_texture(kind, ca, cb, w, h,
                                   jnp.asarray([0.0001]), jnp.asarray([0.0001])))
    odd = np.asarray(eval_texture(kind, ca, cb, w, h,
                                  jnp.asarray([0.0015]), jnp.asarray([0.0001])))
    np.testing.assert_allclose(even[0], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(odd[0], [0.9, 0.9, 0.9])

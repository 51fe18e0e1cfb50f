"""Bounce-0 per-tile frustum-culled sphere lists (the fused tier's PVS).

The listed intersection kernel must be BIT-identical to the brute-force
kernel: the cull is conservative (f64 cone planes + radius margin) and the
list keeps ascending global order, so the strict-< argmin resolves ties the
same way. These tests are the A/B oracle for that claim.
"""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.camera import Camera
from pathtracer_tpu.integrator import TILE, make_pass_fn, tile_sphere_lists
from pathtracer_tpu.scene import DIELECTRIC, LAMBERTIAN, METAL, SceneBuilder


def _shirley_like(n=40, seed=3):
    """A spread-out random scene so per-tile culling is nontrivial."""
    cam = Camera.create(eye=(8, 2, 3), target=(0, 0.5, 0), up=(0, 1, 0),
                        aspect=2.0, vertical_fov_deg=30.0)
    rs = np.random.RandomState(seed)
    b = SceneBuilder()
    b.add_sphere((0, -1000, 0), 1000.0, LAMBERTIAN, color_a=(0.5, 0.5, 0.5))
    mats = [LAMBERTIAN, METAL, DIELECTRIC]
    for i in range(n):
        c = (rs.uniform(-6, 6), rs.uniform(0.15, 0.5), rs.uniform(-6, 6))
        b.add_sphere(c, rs.uniform(0.15, 0.5), mats[i % 3],
                     color_a=tuple(rs.uniform(0.1, 0.9, 3)))
    scene = b.build(camera=cam)

    def bg(d):
        t = 0.5 * (d[..., 1] + 1.0)
        white = jnp.ones((3,), d.dtype)
        escape = jnp.asarray([0.5, 0.7, 1.0], d.dtype)
        return (1.0 - t[..., None]) * white + t[..., None] * escape

    bg.pallas_params = (1, ((1.0, 1.0, 1.0), (0.5, 0.7, 1.0)))
    return cam, scene, bg


def test_listed_kernel_bit_matches_brute_force():
    """Full tiled pass (fused pallas2 tier, interpret mode) with per-tile
    lists vs without: bit-identical radiance and segment count."""
    cam, scene, bg = _shirley_like()
    W, H, SPP, B = 96, 64, 2, 5
    pass_fn = make_pass_fn(cam, bg, W, H, SPP, B,
                           backend="pallas2_interpret", tiled=True)
    lists, counts = tile_sphere_lists(
        cam, np.asarray(scene.center), np.asarray(scene.radius),
        np.asarray(scene.valid), W, H)
    # the cull must actually cull for this test to mean anything
    n_spheres = int(np.asarray(scene.valid).sum())
    assert counts.max() <= lists.shape[1]
    assert counts.mean() < 0.8 * n_spheres, counts.mean()
    bl = (jnp.asarray(lists), jnp.asarray(counts))

    want, want_segs = pass_fn(scene, 0)
    got, got_segs = pass_fn(scene, 0, block_lists=bl)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert int(got_segs) == int(want_segs)


def test_tile_lists_cover_all_primary_hits():
    """Host f64 oracle: every sphere a tile's primary rays can hit is in
    that tile's list (conservative-cull completeness, independent of the
    kernel)."""
    cam, scene, bg = _shirley_like(n=25, seed=9)
    W, H = 128, 64
    center = np.asarray(scene.center, np.float64)
    radius = np.asarray(scene.radius, np.float64)
    valid = np.asarray(scene.valid, bool)
    lists, counts = tile_sphere_lists(cam, center, radius, valid, W, H)
    tyn, txn = -(-H // TILE), -(-W // TILE)
    # dense in-tile jitter grid of directions per tile (f64)
    jj = np.linspace(0.0, 1.0, 9)
    for ty in range(tyn):
        for tx in range(txn):
            t = ty * txn + tx
            has = set(lists[t, :counts[t, 0]].tolist())
            px = tx * TILE + np.arange(TILE)
            py = ty * TILE + np.arange(TILE)
            cx = (px[None, :, None] + jj[None, None, :]) / W
            cy = 1.0 - (py[:, None, None] + jj[None, None, :]) / H
            d = np.stack(np.broadcast_arrays(
                cam.lower_left_x + cam.view_x * cx,
                cam.lower_left_y + cam.view_y * cy,
                np.full_like(cx * cy, -1.0)), axis=-1).reshape(-1, 3)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            # origin-zero hit test: b' = c.d, g = r^2-|c|^2, disc = g+b'^2
            bp = d @ center.T
            g = (radius ** 2 - (center ** 2).sum(1))[None, :]
            disc = g + bp ** 2
            hit = (disc >= 0) & valid[None, :]
            at = bp + np.where((g >= 0) & (bp >= 0), 1.0, -1.0) * np.sqrt(
                np.where(disc >= 0, disc, 0.0))
            hit &= at >= 0
            for s in np.nonzero(hit.any(axis=0))[0]:
                assert int(s) in has, (ty, tx, int(s))


def test_tile_frustum_planes_contain_their_rays():
    """Direct oracle for the shared plane builder (ops/frustum.py): every
    jittered ray direction of a tile must be inside that tile's cone (all
    plane dots >= 0, both film conventions), and most tiles must EXCLUDE
    the far-corner tile's rays (the cull has actual power)."""
    from pathtracer_tpu.ops.frustum import tile_frustum_planes

    cam, _, _ = _shirley_like()
    W, H = 96, 64
    txn, tyn = -(-W // TILE), -(-H // TILE)
    rs = np.random.RandomState(0)
    for flip in (True, False):
        planes = tile_frustum_planes(cam, W, H, txn, tyn, flip_y=flip,
                                     with_z_plane=True)
        assert planes.shape == (tyn * txn, 5, 3)
        for ty in range(tyn):
            for tx in range(txn):
                t = ty * txn + tx
                # 64 jittered sample dirs inside the tile
                px = tx * TILE + rs.uniform(0, TILE, 64)
                py = ty * TILE + rs.uniform(0, TILE, 64)
                cx = px / W
                cy = (1.0 - py / H) if flip else py / H
                dirs = np.stack([cam.lower_left_x + cam.view_x * cx,
                                 cam.lower_left_y + cam.view_y * cy,
                                 np.full(64, -1.0)], axis=-1)
                dots = np.einsum("pk,nk->pn", planes[t], dirs)
                assert (dots >= -1e-12).all(), (flip, ty, tx)
        # power: tile (0,0)'s cone must reject the opposite corner's rays
        far = (tyn - 1) * txn + (txn - 1)
        cx = ((txn - 1) * TILE + rs.uniform(0, TILE, 64)) / W
        py = (tyn - 1) * TILE + rs.uniform(0, TILE, 64)
        cy = (1.0 - py / H) if flip else py / H
        dirs = np.stack([cam.lower_left_x + cam.view_x * cx,
                         cam.lower_left_y + cam.view_y * cy,
                         np.full(64, -1.0)], axis=-1)
        dots = np.einsum("pk,nk->pn", planes[0], dirs)
        assert (dots < 0).any(axis=0).all(), flip
        assert far != 0

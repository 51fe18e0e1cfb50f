"""Fused single-kernel bounce (fused_bounce_kernel.py) vs the two-kernel
intersect+shade pipeline, interpret mode on CPU. The fused kernel calls the
SAME register-level helpers (intersect_regs / shade_body), so outputs must
be BIT-identical — any divergence means the fusion changed arithmetic.

Reference analog: the OCaml integrator's single scatter-driven loop body
(path_tracer/src/integrator.ml:30-66) never split intersection from
shading; these tests pin that the re-unified kernel is a pure fusion."""

import os

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops.lds import Sampler
from pathtracer_tpu.ops.pallas import fused_bounce_kernel as fbk
from pathtracer_tpu.ops.pallas import shade_kernel as shk
from pathtracer_tpu.ops.pallas import sphere_kernel as sk
from pathtracer_tpu.models import shirley


def _shirley_wavefront(W=64, H=64, B=6):
    scene, cam, background = shirley.build(W / H)
    sampler = Sampler(2 + 2 * B)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    offset = jnp.asarray((ys * W + xs).reshape(-1).astype(np.uint32))
    dx = sampler.get(offset, 0)
    dy = sampler.get(offset, 1)
    cx = (jnp.asarray(xs.reshape(-1), jnp.float32) + dx) / W
    cy = 1.0 - (jnp.asarray(ys.reshape(-1), jnp.float32) + dy) / H
    d = cam.ray_dirs(cx, cy, jnp.float32).reshape(-1, 3)
    org = jnp.zeros_like(d)
    return scene, background, sampler, org, d, offset


def test_fused_bounce_matches_two_kernel():
    """Full 6-bounce trace (with the default compaction schedule) A/B'd
    over the fuse knob: bit-identical radiance and segment count."""
    from pathtracer_tpu.integrator import _trace_pallas2

    scene, background, sampler, org, d, offset = _shirley_wavefront()

    def run(fuse):
        old = os.environ.get("PATHTRACER_FUSE_BOUNCE")
        os.environ["PATHTRACER_FUSE_BOUNCE"] = fuse
        try:
            return _trace_pallas2(scene, sampler, org, d, offset, 6,
                                  background, None, interpret=True)
        finally:
            if old is None:
                del os.environ["PATHTRACER_FUSE_BOUNCE"]
            else:
                os.environ["PATHTRACER_FUSE_BOUNCE"] = old

    rad1, segs1 = run("1")
    rad0, segs0 = run("0")
    assert int(segs0) == int(segs1)
    np.testing.assert_array_equal(np.asarray(rad0), np.asarray(rad1))


def test_fused_bounce_listed_matches_two_kernel():
    """The per-tile-PVS (listed) fused variant vs intersect_state_pallas
    (listed) + shade_pallas, kernel-level, one bounce, bit-identical
    state and radiance. Lists here are synthetic per-block subsets so the
    list walk (incl. LIST_UNROLL padding with duplicated entries) is
    actually exercised, not just the full-table path."""
    scene, background, sampler, org, d, offset = _shirley_wavefront(
        W=64, H=32, B=2)
    tables = sk.pack_spheres_pallas(scene.center, scene.radius, scene.valid)
    pack_t = shk.pack_material_tables(scene.shade_pack)
    bg_mode, bg_colors = background.pallas_params
    bg_colors = jnp.asarray(bg_colors, jnp.float32)

    n = org.shape[0]
    assert n % sk.RAY_BLOCK == 0
    rows = n // sk.LANES
    n_blocks = n // sk.RAY_BLOCK
    state = jnp.concatenate(
        [org.T, d.T, org.T * 0.0 + 1.0,
         jnp.ones((1, n), jnp.float32)]).reshape(10, rows, sk.LANES)
    off_rows = offset.reshape(rows, sk.LANES)
    limbs = jnp.asarray([[sampler.hi[2], sampler.lo[2]],
                         [sampler.hi[3], sampler.lo[3]]], jnp.uint32)

    # synthetic PVS: every block sees a different rotation of the sphere
    # table, padded to LIST_UNROLL with entry 0 (the builder's convention)
    S = int(scene.center.shape[0])
    counts = np.full((n_blocks, 1),
                     -(-S // sk.LIST_UNROLL) * sk.LIST_UNROLL, np.int32)
    K = int(counts.max())
    lists = np.zeros((n_blocks, K), np.int32)
    for b in range(n_blocks):
        lists[b, :S] = np.roll(np.arange(S, dtype=np.int32), b)
    bl = (jnp.asarray(lists), jnp.asarray(counts))

    at, idx = sk.intersect_state_pallas(tables, state, interpret=True,
                                        block_lists=bl)
    st_want, rad_want = shk.shade_pallas(state, pack_t, idx, off_rows, at,
                                         limbs, bg_colors, bg_mode=bg_mode,
                                         interpret=True)
    st_got, rad_got = fbk.fused_bounce_pallas(
        tables, state, pack_t, off_rows, limbs, bg_colors,
        bg_mode=bg_mode, block_lists=bl, interpret=True)
    np.testing.assert_array_equal(np.asarray(st_got), np.asarray(st_want))
    np.testing.assert_array_equal(np.asarray(rad_got), np.asarray(rad_want))

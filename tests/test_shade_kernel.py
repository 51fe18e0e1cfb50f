"""Unit tests for the fused shade kernel's polynomial transcendentals and
fixed-point sampler (pure functions — the kernel itself is TPU-only and is
A/B'd against the XLA path on hardware; BASELINE.md records the RMSE)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops.pallas import shade_kernel as shk
from pathtracer_tpu.ops.lds import Sampler


def test_atan2_poly_accuracy():
    rs = np.random.RandomState(0)
    y = jnp.asarray(rs.uniform(-2, 2, 4096).astype(np.float32))
    x = jnp.asarray(rs.uniform(-2, 2, 4096).astype(np.float32))
    got = np.asarray(shk._atan2(y, x))
    want = np.arctan2(np.asarray(y), np.asarray(x))
    assert np.abs(got - want).max() < 3e-6


def test_acos_poly_accuracy():
    x = jnp.asarray(np.linspace(-1, 1, 4001).astype(np.float32))
    got = np.asarray(shk._acos(x))
    want = np.arccos(np.asarray(x, np.float64))
    assert np.abs(got - want).max() < 3e-6


def test_kernel_lds_matches_sampler():
    s = Sampler(6)
    offs = jnp.arange(8192, dtype=jnp.uint32)
    for d in range(4):
        want = np.asarray(s.get(offs, d))
        got = np.asarray(shk._lds(offs, s.hi[d], s.lo[d]))
        # kernel variant drops 1 sub-f32-resolution bit
        assert np.abs(got - want).max() <= 2.0 ** -24

"""Unit tests for the fused shade kernel's polynomial transcendentals and
fixed-point sampler (pure functions — the kernel itself is TPU-only and is
A/B'd against the XLA path on hardware; BASELINE.md records the RMSE)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops.pallas import shade_kernel as shk
from pathtracer_tpu.ops.lds import Sampler


def test_atan2_poly_accuracy():
    rs = np.random.RandomState(0)
    y = jnp.asarray(rs.uniform(-2, 2, 65536).astype(np.float32))
    x = jnp.asarray(rs.uniform(-2, 2, 65536).astype(np.float32))
    got = np.asarray(shk._atan2(y, x))
    want = np.arctan2(np.asarray(y, np.float64), np.asarray(x, np.float64))
    assert np.abs(got - want).max() < 5e-7


def test_atan2_poly_relative_accuracy():
    """RELATIVE accuracy is the load-bearing property: uv = atan2/2pi
    feeds checker parity on the huge ground sphere, where a 2.3e-5
    relative error (the old polynomial) flips ~0.04% of diffuse samples
    across a texel boundary and dominated the fused-path RMSE."""
    z = np.linspace(1e-9, 1.0, 200001).astype(np.float32)
    got = np.asarray(shk._atan2(jnp.asarray(z), jnp.ones_like(jnp.asarray(z))))
    want = np.arctan(np.asarray(z, np.float64))
    rel = np.abs(got - want) / want
    assert rel.max() < 4e-7


def test_acos_poly_accuracy():
    x = jnp.asarray(np.linspace(-1, 1, 400001).astype(np.float32))
    got = np.asarray(shk._acos(x))
    want = np.arccos(np.asarray(x, np.float64))
    assert np.abs(got - want).max() < 5e-7


def test_kernel_lds_matches_sampler():
    s = Sampler(6)
    offs = jnp.arange(8192, dtype=jnp.uint32)
    for d in range(4):
        want = np.asarray(s.get(offs, d))
        got = np.asarray(shk._lds(offs, s.hi[d], s.lo[d]))
        # kernel variant drops 1 sub-f32-resolution bit
        assert np.abs(got - want).max() <= 2.0 ** -24

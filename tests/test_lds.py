"""Sampler tests: fixed-point vs float64 oracle, plus analytic QMC-integral
oracles in the style of the reference's test suite
(low_discrepancy_sequence/test/low_discrepancy_sequence_test.ml:6-56)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops.lds import Sampler, alphas_f64, phi, sample_f64


def test_phi_known_values():
    # d=1: golden ratio; d=2: plastic number
    assert abs(phi(1) - (1 + 5 ** 0.5) / 2) < 1e-12
    assert abs(phi(2) - 1.3247179572447460) < 1e-12


def test_fixed_point_matches_f64_oracle():
    s = Sampler(dimension=18)
    offsets = np.concatenate([
        np.arange(0, 4096),
        np.random.RandomState(0).randint(0, 2 ** 22, size=4096),
    ]).astype(np.uint32)
    for d in [0, 1, 5, 17]:
        got = np.asarray(s.get(jnp.asarray(offsets), d))
        want = s.get_f64(offsets.astype(np.int64), d)
        err = np.abs(got - want)
        # wraparound cases: frac may land on opposite sides of an integer
        err = np.minimum(err, 1.0 - err)
        assert err.max() < 2e-7, (d, err.max())


def test_samples_in_unit_interval():
    s = Sampler(4)
    offs = jnp.arange(100000, dtype=jnp.uint32)
    for d in range(4):
        x = np.asarray(s.get(offs, d))
        assert (x >= 0).all() and (x < 1.0).all()


def _qmc_integrate(f, n=20000):
    a = alphas_f64(1)
    offs = np.arange(n, dtype=np.int64)
    xs = sample_f64(a, offs, 0)
    return float(np.mean(f(xs)))


def test_qmc_integrals_match_analytic():
    # same oracle style as the reference LDS test
    assert abs(_qmc_integrate(np.sin) - (1.0 - np.cos(1.0))) < 1e-3
    assert abs(_qmc_integrate(lambda x: np.sqrt(1 - x * x)) - np.pi / 4) < 1e-3
    assert abs(_qmc_integrate(np.exp) - (np.e - 1.0)) < 1e-3
    assert abs(_qmc_integrate(lambda x: x * x) - 1.0 / 3.0) < 1e-3


def test_2d_stratification():
    # R2 pairs should cover the unit square with low discrepancy: counts in a
    # 4x4 grid over 4096 points should each be near 256
    s = Sampler(2)
    offs = np.arange(4096, dtype=np.uint32)
    u = np.asarray(s.get(jnp.asarray(offs), 0))
    v = np.asarray(s.get(jnp.asarray(offs), 1))
    hist = np.histogram2d(u, v, bins=4, range=[[0, 1], [0, 1]])[0]
    assert np.abs(hist - 256).max() < 32

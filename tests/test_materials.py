import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops import shading, vec


def _omega(z):
    x = np.sqrt(max(0.0, 1 - z * z))
    return jnp.asarray([[x, 0.0, z]], jnp.float32)


def test_metal_reflects_and_tints():
    albedo = jnp.asarray([[0.7, 0.6, 0.5]], jnp.float32)
    wi = _omega(0.8)
    wo, attn, ok = shading.scatter(jnp.asarray([1]), albedo,
                                   jnp.asarray([1.5]), jnp.asarray([1 / 1.5]),
                                   wi, jnp.asarray([True]),
                                   jnp.asarray([0.3]), jnp.asarray([0.4]))
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(wo)[0, 2], 0.8, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(wo)[0, 0], -float(wi[0, 0]), rtol=1e-6)
    s5 = (1 - 0.8) ** 5
    want = np.array([0.7, 0.6, 0.5]) + (1 - np.array([0.7, 0.6, 0.5])) * s5
    np.testing.assert_allclose(np.asarray(attn)[0], want, rtol=1e-5)


def test_metal_absorbs_below_horizon():
    # incoming grazing from below: reflected z <= 0 -> Absorb (material.ml:33-35)
    wi = _omega(-0.1)
    _, _, ok = shading.scatter(jnp.asarray([1]), jnp.ones((1, 3)),
                               jnp.asarray([1.5]), jnp.asarray([1 / 1.5]),
                               wi, jnp.asarray([True]),
                               jnp.asarray([0.3]), jnp.asarray([0.4]))
    assert not bool(ok[0])


def test_dielectric_total_internal_reflection():
    # hitting the back face (inside glass), shallow angle -> ratio*s > 1 -> reflect
    wi = _omega(0.2)
    wo, attn, ok = shading.scatter(jnp.asarray([2]), jnp.zeros((1, 3)),
                                   jnp.asarray([1.5]), jnp.asarray([1 / 1.5]),
                                   wi, jnp.asarray([False]),
                                   jnp.asarray([0.99]), jnp.asarray([0.4]))
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(wo)[0], [-float(wi[0, 0]), 0, 0.2],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(attn)[0], 1.0)


def test_dielectric_refracts_at_normal_incidence_with_high_u():
    # normal incidence, front face: schlick = r0 = ((1-1/1.5)/(1+1/1.5))^2 = 0.04
    # u > r0 -> refract straight through
    wi = _omega(1.0)
    wo, _, ok = shading.scatter(jnp.asarray([2]), jnp.zeros((1, 3)),
                                jnp.asarray([1.5]), jnp.asarray([1 / 1.5]),
                                wi, jnp.asarray([True]),
                                jnp.asarray([0.9]), jnp.asarray([0.4]))
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(wo)[0], [0, 0, -1.0], atol=1e-5)


def test_dielectric_reflects_when_u_below_schlick():
    wi = _omega(1.0)
    # r0 = 0.04: u < 0.04 -> reflect
    wo, _, _ = shading.scatter(jnp.asarray([2]), jnp.zeros((1, 3)),
                               jnp.asarray([1.5]), jnp.asarray([1 / 1.5]),
                               wi, jnp.asarray([True]),
                               jnp.asarray([0.01]), jnp.asarray([0.4]))
    np.testing.assert_allclose(np.asarray(wo)[0], [0, 0, 1.0], atol=1e-6)


def test_refraction_snells_law():
    # 45 degrees from air into glass: sin(theta_t) = sin(45)/1.5
    z = np.cos(np.pi / 4)
    wi = _omega(z)
    wo = shading.refract_local(wi, jnp.asarray([1 / 1.5], jnp.float32))
    wo_np = np.asarray(wo)[0]
    sin_t = np.linalg.norm(wo_np[:2])
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)
    assert wo_np[2] < 0  # transmitted into the surface
    # direction is unit
    np.testing.assert_allclose(np.linalg.norm(wo_np), 1.0, rtol=1e-5)


def test_lambertian_uses_albedo():
    albedo = jnp.asarray([[0.25, 0.5, 0.75]], jnp.float32)
    wo, attn, ok = shading.scatter(jnp.asarray([0]), albedo,
                                   jnp.asarray([1.5]), jnp.asarray([1 / 1.5]),
                                   _omega(0.9), jnp.asarray([True]),
                                   jnp.asarray([0.3]), jnp.asarray([0.4]))
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(attn)[0], [0.25, 0.5, 0.75])
    np.testing.assert_allclose(float(vec.quadrance(wo)[0]), 1.0, rtol=1e-5)

"""Pallas sphere kernel vs the fused-XLA intersection (interpret mode on CPU
— the A/B correctness oracle in the spirit of the reference's --no-simd)."""

import numpy as np
import jax.numpy as jnp

from pathtracer_tpu.ops import spheres
from pathtracer_tpu.ops.pallas import sphere_kernel as sk


def test_pallas_matches_xla_intersection():
    rs = np.random.RandomState(7)
    S = 64
    n = sk.RAY_BLOCK  # one block
    centers = rs.uniform(-8, 8, (S, 3)).astype(np.float32)
    radii = rs.uniform(0.3, 2.0, S).astype(np.float32)
    valid = np.ones(S, bool)
    valid[S // 2] = False
    org = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    packed = spheres.pack_for_intersect(jnp.asarray(centers),
                                        jnp.asarray(radii), jnp.asarray(valid))
    at_x, idx_x, hit_x, inv_a_x = spheres.intersect_packed(
        *packed, jnp.asarray(valid), jnp.asarray(org), jnp.asarray(d))

    tables = sk.pack_spheres_pallas(jnp.asarray(centers), jnp.asarray(radii),
                                    jnp.asarray(valid))
    at_p, idx_p, hit_p, inv_a_p = sk.intersect_spheres_pallas(
        tables, jnp.asarray(org), jnp.asarray(d), interpret=True)

    np.testing.assert_array_equal(np.asarray(hit_x), np.asarray(hit_p))
    h = np.asarray(hit_x)
    np.testing.assert_array_equal(np.asarray(idx_x)[h], np.asarray(idx_p)[h])
    np.testing.assert_allclose(np.asarray(at_x)[h], np.asarray(at_p)[h],
                               rtol=1e-5)

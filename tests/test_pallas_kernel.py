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


def test_tri_kernel_matches_xla():
    """Pallas triangle-pool kernel vs the XLA (N, T) sweep (the fused-tier
    completion for mixed pool scenes, cornell-box/bin/main.ml:93-155)."""
    from pathtracer_tpu.ops import triangles as tri_ops
    from pathtracer_tpu.ops.pallas import tri_kernel as tk

    rs = np.random.RandomState(11)
    t_cnt = 30
    n = tk.RAY_BLOCK
    a = rs.uniform(-6, 6, (t_cnt, 3)).astype(np.float32)
    e1 = rs.randn(t_cnt, 3).astype(np.float32) * 2.0
    e2 = rs.randn(t_cnt, 3).astype(np.float32) * 2.0
    valid = np.ones(t_cnt, bool)
    valid[5] = False
    org = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    comps = tri_ops.pack_for_intersect(jnp.asarray(a), jnp.asarray(e1),
                                       jnp.asarray(e2), jnp.asarray(valid))
    t_x, idx_x, hit_x = tri_ops.intersect_tris(comps, jnp.asarray(org),
                                               jnp.asarray(d))

    table = tk.pack_tris_pallas(jnp.asarray(a), jnp.asarray(e1),
                                jnp.asarray(e2), jnp.asarray(valid))
    t_p, idx_p, hit_p = tk.intersect_tris_pallas(table, jnp.asarray(org),
                                                 jnp.asarray(d),
                                                 interpret=True)

    np.testing.assert_array_equal(np.asarray(hit_x), np.asarray(hit_p))
    h = np.asarray(hit_x)
    np.testing.assert_array_equal(np.asarray(idx_x)[h], np.asarray(idx_p)[h])
    np.testing.assert_allclose(np.asarray(t_x)[h], np.asarray(t_p)[h],
                               rtol=1e-5, atol=1e-6)


def test_tri_kernel_dead_block_early_exit():
    from pathtracer_tpu.ops.pallas import tri_kernel as tk

    rs = np.random.RandomState(3)
    t_cnt = 8
    n = 2 * tk.RAY_BLOCK
    a = rs.uniform(-4, 4, (t_cnt, 3)).astype(np.float32)
    e1 = rs.randn(t_cnt, 3).astype(np.float32)
    e2 = rs.randn(t_cnt, 3).astype(np.float32)
    org = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    alive = np.zeros(n, bool)
    alive[: tk.RAY_BLOCK] = True  # second block entirely dead
    table = tk.pack_tris_pallas(jnp.asarray(a), jnp.asarray(e1),
                                jnp.asarray(e2),
                                jnp.ones(t_cnt, bool))
    t_p, idx_p, hit_p = tk.intersect_tris_pallas(
        table, jnp.asarray(org), jnp.asarray(d), jnp.asarray(alive),
        interpret=True)
    assert not np.asarray(hit_p)[tk.RAY_BLOCK:].any()

"""Vectorized ray-vs-sphere-set intersection.

TPU-native counterpart of both the reference's scalar sphere test
(`sphere/src/sphere.ml:35-54`) and its 4-wide AVX2 Rust leaf kernel
(`sphere-intersect-rs/src/lib.rs:102-178`): one fused (N rays x S spheres)
evaluation where the ray-independent / sphere-independent dot products are
matmuls that ride the MXU and the per-pair quadratic solve is VPU
elementwise math, followed by a masked argmin reduction.

Numerically this follows the reference's stable quadratic:
    b' = f.d,  q = fma(sign(b'), sqrt(a*discrim), b'),
    t  = c/q if c > 0 else q/a          (c = |f|^2 - r^2)
with one algebraic substitution: the reference computes
discrim = r^2 - |d*(b'/a) - f|^2 in vector form; forming that (N,S,3)
difference would burn HBM, so we use the identity
|d*(b'/a) - f|^2 = |f|^2 - b'^2/a and compute discrim = r^2 - |f|^2 + b'^2/a.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from . import vec

BIG = np.float32(3.0e38)


def intersect_brute(center, radius, valid, org, d, t_min=0.0, t_max=None,
                    precision=lax.Precision.HIGHEST):
    """Nearest-hit query of N rays against all S spheres.

    center: (S,3), radius: (S,), valid: (S,) bool; org, d: (N,3).
    Returns (t_hit (N,), idx (N,) int32, hit (N,) bool).
    """
    if t_max is None:
        t_max = BIG
    # Ray-sphere coupling terms via MXU matmuls (K=3 contraction).
    cd = jnp.matmul(d, center.T, precision=precision)  # (N,S) = c.d
    co = jnp.matmul(org, center.T, precision=precision)  # (N,S) = c.o
    c2 = vec.quadrance(center)  # (S,)
    o2 = vec.quadrance(org)  # (N,)
    od = vec.dot(org, d)  # (N,)
    a = vec.quadrance(d)  # (N,)

    bp = cd - od[:, None]  # (N,S) b' = f.d
    quad_f = c2[None, :] - 2.0 * co + o2[:, None]  # (N,S) |f|^2
    r2 = radius * radius  # (S,)
    discrim = r2[None, :] - quad_f + bp * bp / a[:, None]
    c = quad_f - r2[None, :]
    sign_bp = jnp.where(bp >= 0.0, jnp.float32(1.0), jnp.float32(-1.0))
    q = sign_bp * jnp.sqrt(jnp.maximum(a[:, None] * discrim, 0.0)) + bp
    t = jnp.where(c > 0.0, c / q, q / a[:, None])
    ok = (discrim >= 0.0) & (t >= t_min) & (t <= t_max) & valid[None, :]
    t_cand = jnp.where(ok & jnp.isfinite(t), t, BIG)
    idx = jnp.argmin(t_cand, axis=1).astype(jnp.int32)
    t_best = jnp.min(t_cand, axis=1)
    hit = t_best < BIG
    return t_best, idx, hit

"""Pallas TPU kernel: brute-force nearest-hit ray/triangle-pool intersection.

Completes the native (Pallas) tier for mixed pool scenes: the reference's
single unified `Shape` intersect covers spheres AND triangles
(cornell-box/bin/main.ml:93-155); round 1 ran the sphere pool through the
Pallas kernel but fell back to an XLA (N, T) broadcast sweep for the
triangle pool. This kernel mirrors ops/pallas/sphere_kernel.py: each grid
step holds a 1024-ray block as (8, 128) f32 vregs (rays in lanes) and loops
over triangles, broadcasting one triangle's 9 components per iteration from
a lane-replicated SMEM table. Moller-Trumbore per (triangle x 1024 rays)
runs entirely in registers — no (N, T) HBM intermediates.

Semantics match ops/triangles.intersect_tris (and the reference's
triangle.ml:74-98): |det| < 1e-6 -> miss; 0 <= u <= 1, 0 <= v, u+v <= 1;
t >= 0. Padding triangles have e1 = e2 = 0 so det == 0 and they never hit.
Ties on t resolve to the LOWEST triangle index (same as the XLA sweep's
argmin-by-min-index), because the running-min update is strict.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(3.0e38)
RAY_BLOCK = 1024
LANES = 128
_EPS = np.float32(1e-6)
UNROLL = 4


def pack_tris_pallas(a, e1, e2, valid):
    """(9, T) SMEM triangle table [a, e1, e2 by component]; invalid or
    padding rows get e1 = e2 = 0 (det == 0: never hits). T padded to a
    multiple of UNROLL."""
    a = jnp.asarray(a, jnp.float32)
    e1 = jnp.where(jnp.asarray(valid)[:, None], jnp.asarray(e1, jnp.float32),
                   0.0)
    e2 = jnp.where(jnp.asarray(valid)[:, None], jnp.asarray(e2, jnp.float32),
                   0.0)
    tab = jnp.concatenate([a.T, e1.T, e2.T])  # (9, T)
    t_cnt = tab.shape[1]
    pad = (-t_cnt) % UNROLL
    if pad:
        tab = jnp.pad(tab, ((0, 0), (0, pad)))
    return tab


def _kernel(tri_ref, alive_ref, d0_ref, d1_ref, d2_ref,
            o0_ref, o1_ref, o2_ref, t_ref, idx_ref, *, n_tris):
    t_ref[:] = jnp.full(t_ref.shape, BIG, jnp.float32)
    idx_ref[:] = jnp.zeros(idx_ref.shape, jnp.int32)
    any_alive = jnp.max(alive_ref[:]) > 0

    @pl.when(any_alive)
    def _run():
        d0, d1, d2 = d0_ref[:], d1_ref[:], d2_ref[:]
        o0, o1, o2 = o0_ref[:], o1_ref[:], o2_ref[:]

        def one(s, best_t, best_idx):
            ax = tri_ref[0, s]
            ay = tri_ref[1, s]
            az = tri_ref[2, s]
            e1x = tri_ref[3, s]
            e1y = tri_ref[4, s]
            e1z = tri_ref[5, s]
            e2x = tri_ref[6, s]
            e2y = tri_ref[7, s]
            e2z = tri_ref[8, s]
            # pvec = d x e2
            pvx = d1 * e2z - d2 * e2y
            pvy = d2 * e2x - d0 * e2z
            pvz = d0 * e2y - d1 * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            det_inv = 1.0 / det
            tvx, tvy, tvz = o0 - ax, o1 - ay, o2 - az
            uu = det_inv * (tvx * pvx + tvy * pvy + tvz * pvz)
            # qvec = tvec x e1
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            vv = det_inv * (d0 * qvx + d1 * qvy + d2 * qvz)
            tt = det_inv * (e2x * qvx + e2y * qvy + e2z * qvz)
            ok = ((jnp.abs(det) >= _EPS) & (uu >= 0.0) & (uu <= 1.0)
                  & (vv >= 0.0) & (uu + vv <= 1.0) & (tt >= 0.0))
            cand = jnp.where(ok, tt, BIG)
            upd = cand < best_t
            best_t = jnp.where(upd, cand, best_t)
            best_idx = jnp.where(upd, s, best_idx)
            return best_t, best_idx

        def body(i, carry):
            best_t, best_idx = carry
            base = i * UNROLL
            for k in range(UNROLL):
                best_t, best_idx = one(base + k, best_t, best_idx)
            return best_t, best_idx

        init = (jnp.full(d0.shape, BIG, jnp.float32),
                jnp.zeros(d0.shape, jnp.int32))
        best_t, best_idx = jax.lax.fori_loop(0, n_tris // UNROLL, body, init)
        t_ref[:] = best_t
        idx_ref[:] = best_idx


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_tris_pallas(table, org, d, alive=None, interpret=False):
    """Nearest-hit of N rays against the packed triangle table.

    org, d: (N, 3) f32, N a multiple of RAY_BLOCK. Returns (t (N,),
    idx (N,) int32, hit (N,) bool) — same contract as
    ops/triangles.intersect_tris minus the (u, v) recompute (the caller
    re-derives the winner's barycentrics with mt_single, as the XLA path
    already does)."""
    n = org.shape[0]
    assert n % RAY_BLOCK == 0, n
    n_tris = table.shape[1]
    rows = n // LANES
    grid = n // RAY_BLOCK
    block_rows = RAY_BLOCK // LANES

    def ray_comp(x):
        return x.reshape(rows, LANES)

    if alive is None:
        alive_rows = jnp.ones((rows, LANES), jnp.float32)
    else:
        alive_rows = ray_comp(alive.astype(jnp.float32))
    ray_inputs = [ray_comp(d[:, 0]), ray_comp(d[:, 1]), ray_comp(d[:, 2]),
                  ray_comp(org[:, 0]), ray_comp(org[:, 1]),
                  ray_comp(org[:, 2])]
    table_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, idx = pl.pallas_call(
        functools.partial(_kernel, n_tris=n_tris),
        grid=(grid,),
        in_specs=[table_spec] + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32)),
        interpret=interpret,
    )(table, alive_rows, *ray_inputs)
    t = t.reshape(n)
    idx = idx.reshape(n)
    return t, idx, t < BIG

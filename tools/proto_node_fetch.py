"""Prototype: measure the cost of dependent dynamic node fetches from a
VMEM-resident node table inside a Pallas kernel — the critical primitive
for a shared-stack BVH packet traversal kernel.

Layout: 16 nodes packed per (1, 128) row -> (M//16, 128) f32. Fetch is a
dynamic-SUBLANE row load (supported) + pltpu.roll by a dynamic lane shift
+ static lane extracts. (Dynamic LANE slicing is rejected by Mosaic:
"cannot statically prove that index in dimension 1 is a multiple of 128".)

Each step: fetch node i -> slab test against an (8, 128)-shaped ray packet
-> any-reduce decides the next node (serial dependent chain, like a real
walk).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 1 << 15  # 32k nodes
STEPS = 2048


def kernel_b(nodes_ref, state_ref, out_ref):
    org = state_ref[0:3, :]
    d = state_ref[3:6, :]
    inv_d = 1.0 / d

    def body(k, carry):
        i, acc, t_best = carry
        row = nodes_ref[pl.ds(i >> 4, 1), :]          # (1, 128) sublane-dyn
        g = pltpu.roll(row, -(i & 15) * 8, axis=1)    # fields to lanes 0..7
        gi = pltpu.bitcast(g, jnp.int32)
        lo_x = g[0, 0]
        lo_y = g[0, 1]
        lo_z = g[0, 2]
        hi_x = g[0, 3]
        hi_y = g[0, 4]
        hi_z = g[0, 5]
        t0x = (lo_x - org[0]) * inv_d[0]
        t1x = (hi_x - org[0]) * inv_d[0]
        t0y = (lo_y - org[1]) * inv_d[1]
        t1y = (hi_y - org[1]) * inv_d[1]
        t0z = (lo_z - org[2]) * inv_d[2]
        t1z = (hi_z - org[2]) * inv_d[2]
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        anyhit = jnp.any(jnp.maximum(tn, 0.0) <= jnp.minimum(tf, t_best))
        nxt = jax.lax.select(anyhit, gi[0, 6] % M, gi[0, 7] % M)
        nxt = jnp.clip(jnp.abs(nxt), 0, M - 1)
        return nxt, acc + i, jnp.where(tn < tf, jnp.minimum(t_best, tf),
                                       t_best)

    i0 = jnp.int32(1)
    acc0 = jnp.int32(0)
    t0 = jnp.full((3, 128), 1e30, jnp.float32)
    i, acc, t_best = jax.lax.fori_loop(0, STEPS, body, (i0, acc0, t0))
    out_ref[0, 0] = acc + i
    out_ref[0, 1] = t_best.astype(jnp.int32)[0, 0]


def run_b():
    nodes = np.random.randn(M // 16, 128).astype(np.float32)
    state = np.random.randn(8, 128).astype(np.float32) + 2.0
    f = jax.jit(pl.pallas_call(
        kernel_b,
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    ))
    r = f(nodes, state)
    r.block_until_ready()
    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        r = f(nodes, state)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / n_rep
    print(f"B: {dt*1e6:.1f} us total, {dt/STEPS*1e9:.1f} ns/node "
          f"({dt/STEPS*940e6:.1f} cyc @940MHz)")


if __name__ == "__main__":
    run_b()

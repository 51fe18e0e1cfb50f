"""Pallas TPU kernel: wavefront lane compaction (stable partition).

The throughput role of the reference's native tier is keeping vector lanes
busy (`sphere-intersect-rs/src/lib.rs:102-178` exists so no AVX lane idles);
on TPU the analogous dead weight is terminated paths occupying VPU lanes.
Measured on the bench scene, lane occupancy collapses to ~29% by bounce 2
while 87% of 1024-lane blocks still contain at least one live ray — the
block-level early exit can no longer help, only true lane compaction can
(ideal win ~3x, tools/measure_occupancy.py).

TPU has no per-lane scatter/gather shuffle, so compaction is built from the
primitives it does have: a stable partition of each flattened (8, 128) block
via a monotone bit-shift network — each live lane's shift distance is the
count of dead lanes before it (computed with log-step roll cumsums), and the
lanes move left in 10 rounds (shift by 2^j for each set bit j), which is
collision-free because shift distances are non-decreasing in lane order.
Ghost copies left behind by a move are killed with a validity bit. Everything
runs on (8, 128) vregs with `pltpu.roll`; ~500 vector ops per block vs ~7700
for the 640-sphere intersection loop it feeds.

Cross-block packing happens afterwards in XLA at row granularity (gather of
512-byte rows by a permutation of ~1.5k row indices — see
integrator row-packing), which wastes at most one partial row per block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sphere_kernel import LANES, RAY_BLOCK

BLOCK_ROWS = RAY_BLOCK // LANES  # 8
N_STATE = 10  # org3, dir3, attn3, alive
N_RAD = 3


def _shift_up(x, sh, lane_iota):
    """y[p] = x[p + sh] over the flattened (BLOCK_ROWS, LANES) block
    (flat index p = row * LANES + lane); positions past the end wrap — the
    caller masks them out via the validity bit."""
    if sh % LANES == 0:
        return pltpu.roll(x, BLOCK_ROWS - sh // LANES, 0)
    a = pltpu.roll(x, LANES - sh, 1)   # same row, lane l+sh (mod LANES)
    b = pltpu.roll(a, BLOCK_ROWS - 1, 0)  # next row for the wrapped lanes
    return jnp.where(lane_iota < LANES - sh, a, b)


def _cumsum_flat_excl(v, lane_iota, sub_iota):
    """Exclusive cumsum of int32 v over the flattened block."""
    x = v
    for j in range(7):  # within-row inclusive cumsum over 128 lanes
        sh = 1 << j
        x = x + jnp.where(lane_iota >= sh, pltpu.roll(x, sh, 1), 0)
    rowsum = jnp.broadcast_to(jnp.sum(v, axis=1, keepdims=True), v.shape)
    incl = rowsum
    for j in range(3):  # inclusive cumsum of row sums over 8 sublanes
        sh = 1 << j
        incl = incl + jnp.where(sub_iota >= sh, pltpu.roll(incl, sh, 0), 0)
    return x + (incl - rowsum) - v


def _kernel(st_ref, off_ref, st_o, off_o, k_o):
    lane_iota = lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 1)
    sub_iota = lax.broadcasted_iota(jnp.int32, (BLOCK_ROWS, LANES), 0)
    flat_iota = sub_iota * LANES + lane_iota

    alive = st_ref[9] > 0.0
    dead = jnp.where(alive, 0, 1)
    s = _cumsum_flat_excl(dead, lane_iota, sub_iota)  # shift per live lane

    # payload excludes state row 9 (alive — rebuilt from the live count) and
    # radiance (the caller flushes it to original-order pixels instead of
    # paying 3 more components through the shift network)
    payload = [st_ref[c] for c in range(N_STATE - 1)] + [off_ref[...]]
    s = jnp.where(alive, s, 0)
    valid = jnp.where(alive, 1, 0)

    for j in range(10):  # 2^10 = RAY_BLOCK
        sh = 1 << j
        in_range = flat_iota < RAY_BLOCK - sh
        s_up = _shift_up(s, sh, lane_iota)
        v_up = jnp.where(in_range, _shift_up(valid, sh, lane_iota), 0)
        bit_up = (v_up > 0) & ((s_up & sh) != 0)
        self_moves = (valid > 0) & ((s & sh) != 0)
        payload = [jnp.where(bit_up, _shift_up(x, sh, lane_iota), x)
                   for x in payload]
        s = jnp.where(bit_up, s_up, s)
        valid = jnp.where(bit_up, 1, jnp.where(self_moves, 0, valid))

    k = jnp.sum(jnp.where(alive, 1, 0))
    live = flat_iota < k
    zf = jnp.zeros((BLOCK_ROWS, LANES), jnp.float32)
    for c in range(N_STATE - 1):
        st_o[c] = jnp.where(live, payload[c], zf)
    st_o[N_STATE - 1] = live.astype(jnp.float32)
    off_o[...] = jnp.where(live, payload[N_STATE - 1], 0)
    k_o[pl.program_id(0), 0] = k


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_blocks(state, off, interpret=False):
    """Stable-partition each 1024-lane block of the wavefront: live lanes
    (state[9] > 0) move to the flattened front in order, the tail is zeroed.

    state: (10, rows, LANES) f32; off: (rows, LANES) uint32 LDS offsets
    (travel with their lanes). Radiance does NOT travel — the caller flushes
    it to original-order pixels before compacting.
    Returns (state_c, off_c, k) with k: (rows / 8,) int32 live counts
    per block.
    """
    _, rows, lanes = state.shape
    assert lanes == LANES and rows % BLOCK_ROWS == 0
    nblk = rows // BLOCK_ROWS
    off_i = lax.bitcast_convert_type(off, jnp.int32)

    def spec3(lead):
        return pl.BlockSpec((lead, BLOCK_ROWS, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    lane_spec = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec(memory_space=pltpu.SMEM)  # full (nblk, 1) array
    st_c, off_c, k = pl.pallas_call(
        _kernel,
        grid=(nblk,),
        in_specs=[spec3(N_STATE), lane_spec],
        out_specs=(spec3(N_STATE), lane_spec, k_spec),
        out_shape=(jax.ShapeDtypeStruct((N_STATE, rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((nblk, 1), jnp.int32)),
        interpret=interpret,
    )(state, off_i)
    return (st_c, lax.bitcast_convert_type(off_c, jnp.uint32), k[:, 0])


def compact_blocks_ref(state, off):
    """Pure-JAX oracle for compact_blocks (argsort-based stable partition)."""
    _, rows, lanes = state.shape
    nblk = rows // BLOCK_ROWS
    alive = (state[9] > 0.0).reshape(nblk, RAY_BLOCK)
    order = jnp.argsort(~alive, axis=1, stable=True)  # live first, in order
    k = jnp.sum(alive, axis=1).astype(jnp.int32)
    live = (jnp.arange(RAY_BLOCK)[None, :] < k[:, None])

    def pack_comp(x, fill=0):
        xb = x.reshape(nblk, RAY_BLOCK)
        xc = jnp.take_along_axis(xb, order, axis=1)
        return jnp.where(live, xc, fill).reshape(rows, lanes)

    st_c = jnp.stack([pack_comp(state[c]) for c in range(N_STATE - 1)]
                     + [live.astype(jnp.float32).reshape(rows, lanes)])
    off_c = pack_comp(off)
    return st_c, off_c, k


def pack_rows(state_c, off_c, k):
    """Pack the per-block compacted wavefront globally at row granularity:
    each block's ceil(k/LANES) used rows move to the front (stable), dead
    rows to the back. Rows are 512-byte vectors, so this is an efficient XLA
    gather; the cost is at most one partial row of dead lanes per block.

    Returns (state_p, off_p, n_used_rows) where n_used_rows is the traced
    count of rows holding live lanes (for prefix bucketing)."""
    rows = state_c.shape[1]
    u = -(-k // LANES)  # used rows per block
    row_block = jnp.arange(rows) // BLOCK_ROWS
    row_in_block = jnp.arange(rows) % BLOCK_ROWS
    used = row_in_block < u[row_block]
    perm = jnp.argsort(~used, stable=True)
    return state_c[:, perm], off_c[perm], jnp.sum(u)


def dest_map(alive_pre, k):
    """Closed-form forward map of compact_blocks + pack_rows: for each ORIGINAL
    flat lane index i with alive_pre[i], dest[i] is its flat index in the
    packed ordering (garbage where dead — mask with alive_pre). Pure cumsum
    arithmetic; no scatter, no sort over lanes.

    alive_pre: (rows, LANES) bool pre-compaction; k: (nblk,) live counts.
    Returns dest: (rows * LANES,) int32.
    """
    rows = alive_pre.shape[0]
    nblk = rows // BLOCK_ROWS
    u = -(-k // LANES)
    out_base = jnp.cumsum(u) - u  # exclusive: first packed row of block b
    a = alive_pre.reshape(nblk, RAY_BLOCK)
    dib = jnp.cumsum(a.astype(jnp.int32), axis=1) - 1  # in-block dest
    out_row = out_base[:, None] + dib // LANES
    return (out_row * LANES + dib % LANES).reshape(-1)

"""Pallas TPU kernel: PPM cone-filter photon gather by block broadcast.

The reference gathers per eye hit with a BVH point query
(`progressive_photon_map.ml:319-371` via `shape_tree.ml:222-231`). The
XLA-native substitute (ppm.make_eye_pass.gather) walks 27 hash-grid cells
with per-lane cursors — every step gathers ~10 floats per lane at lane
granularity, which is the slowest memory pattern this TPU has.

This kernel inverts the data movement: eye hits are sorted by the Morton
code of their grid cell so each 1024-lane block shares a compact spatial
neighborhood; photons are sorted by the same Morton key so any cell's
photons are one contiguous range. Per neighbor offset the block computes
the UNION [min start, max end) of its lanes' ranges (two cross-lane
reduces), then streams that range through SMEM in 128-photon DMA chunks;
each photon is broadcast from SMEM scalars to all 1024 lanes (~20 VPU ops),
and a per-lane `start <= idx < end` test reproduces the exact per-lane
cell membership. Every photon thus amortizes its memory traffic over the
whole block instead of being gathered per lane.

Grid cells are an exact dense Morton table (side league <= 2^BITS per
axis, cell size max(radius, extent/side)): no hash collisions, no
duplicate cell visits, and out-of-grid neighbor cells are empty by
construction (the grid bbox covers every deposit).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BITS = 7  # cells per axis = 128; dense table = 2^21 entries
SIDE = 1 << BITS
CH = 128  # photons per DMA chunk (minor-dim tiling alignment)
LANES = 128
BLOCK_ROWS = 8
# photons are sorted in RASTER order (x fastest), so each (dy, dz) row of
# the 3x3x3 neighborhood [x-1, x+1] is ONE contiguous photon range: 9
# stream loops instead of 27, and every in-range photon is streamed at
# most 9x instead of 27x. (Eye hits still sort by cell MORTON key for
# block coherence — the two orders are independent.)
N_OFF = 9

_OFFSETS_YZ = np.array([(y, z) for y in (-1, 0, 1) for z in (-1, 0, 1)],
                       np.int32)


def morton3(cx, cy, cz):
    """Interleave three BITS-bit ints (x lowest): dense 3*BITS-bit key."""
    def expand(v):
        # canonical 10-bit spread (covers BITS <= 10)
        v = v.astype(jnp.uint32)
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v
    return (expand(cx) | (expand(cy) << 1) | (expand(cz) << 2)).astype(
        jnp.int32)


def raster3(cx, cy, cz):
    """Dense raster cell key, x fastest: (z*SIDE + y)*SIDE + x. Any
    [x0, x1] run at fixed (y, z) is contiguous, which is what lets the
    gather kernel stream a whole neighborhood row in one range."""
    return (cz * SIDE + cy) * SIDE + cx


@jax.jit
def build_photon_grid_morton(pos, nrm, flux, valid, lo, cell_size):
    """Sort photons by dense RASTER cell key; build exact per-cell ranges.
    (Name kept from the Morton-ordered revision; hit-side coherence still
    uses Morton keys.)

    pos/nrm/flux: (Np, 3); valid: (Np,); lo: (3,) grid origin (must cover
    every valid deposit); cell_size: scalar >= gather radius.
    Returns (photons_t (16, Np_pad) f32 [pos3, nrm3, flux3, pad],
             start (SIDE^3,) i32, count (SIDE^3,) i32).
    """
    npho = pos.shape[0]
    inv_c = 1.0 / cell_size
    c = jnp.floor((pos - lo[None, :]) * inv_c).astype(jnp.int32)
    c = jnp.clip(c, 0, SIDE - 1)  # valid deposits are inside by construction
    key = raster3(c[:, 0], c[:, 1], c[:, 2])
    m = SIDE ** 3
    key = jnp.where(valid, key, jnp.int32(m))
    key_sorted, order = lax.sort_key_val(key,
                                         jnp.arange(npho, dtype=jnp.int32))
    count = jnp.bincount(key, length=m + 1)[:m].astype(jnp.int32)
    start = (jnp.cumsum(count) - count).astype(jnp.int32)

    np_pad = -(-npho // CH) * CH
    tbl = jnp.full((16, np_pad), np.float32(3.0e38))
    tbl = tbl.at[0:3, :npho].set(pos[order].T)
    tbl = tbl.at[3:6, :npho].set(nrm[order].T)
    tbl = tbl.at[6:9, :npho].set(flux[order].T)
    return tbl, start, count


def query_tables(point, active, lo, cell_size, start, count):
    """Per-lane (9, n) start/end tables — one contiguous raster range per
    (dy, dz) neighborhood row spanning x in [cx-1, cx+1] (clamped to the
    grid) — plus the lane's own cell Morton key for coherence sorting.
    Out-of-grid rows get empty ranges; empty cells inside a row cost
    nothing extra because `start` is the exclusive cumsum over ALL raster
    cells, so the row range covers exactly its photons."""
    inv_c = 1.0 / cell_size
    c = jnp.floor((point - lo[None, :]) * inv_c).astype(jnp.int32)  # (n, 3)
    offs = jnp.asarray(_OFFSETS_YZ)  # (9, 2) = (dy, dz)
    yy = c[None, :, 1] + offs[:, 0:1]  # (9, n)
    zz = c[None, :, 2] + offs[:, 1:2]
    in_grid = ((yy >= 0) & (yy < SIDE) & (zz >= 0) & (zz < SIDE)
               & (c[None, :, 0] >= -1) & (c[None, :, 0] <= SIDE))
    yyl = jnp.clip(yy, 0, SIDE - 1)
    zzl = jnp.clip(zz, 0, SIDE - 1)
    x_lo = jnp.clip(c[None, :, 0] - 1, 0, SIDE - 1)
    x_hi = jnp.clip(c[None, :, 0] + 1, 0, SIDE - 1)
    key_lo = raster3(x_lo, yyl, zzl)  # (9, n)
    key_hi = raster3(x_hi, yyl, zzl)
    ok = in_grid & active[None, :]
    s = jnp.where(ok, start[key_lo], 0)
    e = jnp.where(ok, start[key_hi] + count[key_hi], 0)
    own_key = morton3(*(jnp.clip(c, 0, SIDE - 1).T))
    return s, e, own_key


def _kernel(r_ref, hits_ref, s_ref, e_ref, photons_hbm, out_ref,
            scratch, sem):
    """scratch: (2, 16, CH) SMEM double buffer; sem: DMA((2,)).

    Each offset's chunk loop is double-buffered: the next 128-photon DMA
    is launched before the current chunk is processed, so HBM streaming
    hides under the ~20 VPU ops/photon broadcast (serial start->wait
    measured ~1.8x slower at cornell-default photon densities)."""
    x, y, z = hits_ref[0], hits_ref[1], hits_ref[2]
    nx, ny, nz = hits_ref[3], hits_ref[4], hits_ref[5]
    r = r_ref[0, 0]
    inv_r = 1.0 / r
    r2 = r * r
    zero = jnp.zeros((BLOCK_ROWS, LANES), jnp.float32)
    acc = (zero, zero, zero)

    for o in range(N_OFF):
        s = s_ref[o]
        e = e_ref[o]
        has = e > s
        smin = jnp.min(jnp.where(has, s, jnp.int32(1 << 30)))
        emax = jnp.max(e)
        c0 = (smin // CH) * CH
        n_chunks = jnp.maximum(0, (emax - c0 + CH - 1) // CH)

        def get_dma(slot, ci):
            off = pl.multiple_of(c0 + ci * CH, CH)  # 128-aligned DMA
            return pltpu.make_async_copy(
                photons_hbm.at[:, pl.ds(off, CH)], scratch.at[slot],
                sem.at[slot])

        @pl.when(n_chunks > 0)
        def _warmup():
            get_dma(0, 0).start()

        def chunk_body(ci, accs):
            slot = lax.rem(ci, 2)

            @pl.when(ci + 1 < n_chunks)
            def _prefetch():
                get_dma(lax.rem(ci + 1, 2), ci + 1).start()

            get_dma(slot, ci).wait()
            c = c0 + ci * CH
            # Dead-chunk skip: the streamed range is the UNION over lanes
            # whose [s, e) ranges can sit far apart in raster order when a
            # block straddles a Morton discontinuity — measured (tools/
            # proto_gather_stream) ~89% of chunks contain no photon any
            # lane needs. The DMA still streams every chunk (8 KB, trivial
            # bandwidth, keeps the double buffer simple); only the
            # 128-photon broadcast loop (~2560 VPU ops) is skipped.
            live = jnp.any((s < c + CH) & (e > c))

            def photon_body(j, accs):
                a0, a1, a2 = accs
                idx = c + j
                dx = scratch[slot, 0, j] - x
                dy = scratch[slot, 1, j] - y
                dz = scratch[slot, 2, j] - z
                d2 = dx * dx + dy * dy + dz * dz
                ndot = (scratch[slot, 3, j] * nx + scratch[slot, 4, j] * ny
                        + scratch[slot, 5, j] * nz)
                inr = (idx >= s) & (idx < e)
                ok = inr & (d2 < r2) & (ndot > np.float32(1e-3))
                w = 1.0 - jnp.sqrt(d2) * inv_r  # cone filter k=1
                wf = jnp.where(ok, w, 0.0)
                return (a0 + wf * scratch[slot, 6, j],
                        a1 + wf * scratch[slot, 7, j],
                        a2 + wf * scratch[slot, 8, j])

            return lax.cond(
                live, lambda a: lax.fori_loop(0, CH, photon_body, a),
                lambda a: a, accs)

        acc = lax.fori_loop(0, n_chunks, chunk_body, acc)

    out_ref[0], out_ref[1], out_ref[2] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_flux_pallas(point, normal, s_tab, e_tab, photons_t, radius,
                       interpret=False):
    """Cone-filter gather for n eye hits (n % 1024 == 0, ideally sorted by
    cell Morton key). point/normal: (n, 3); s_tab/e_tab: (N_OFF=9, n) i32
    raster ranges from query_tables; photons_t: (16, Np_pad); radius:
    scalar. Returns flux (n, 3)."""
    n = point.shape[0]
    assert n % (BLOCK_ROWS * LANES) == 0, n
    rows = n // LANES
    grid = rows // BLOCK_ROWS

    hits = jnp.concatenate([point.T, normal.T]).reshape(6, rows, LANES)
    s_r = s_tab.reshape(N_OFF, rows, LANES)
    e_r = e_tab.reshape(N_OFF, rows, LANES)
    r_in = jnp.full((1, 1), radius, jnp.float32)

    def spec3(lead):
        return pl.BlockSpec((lead, BLOCK_ROWS, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  spec3(6), spec3(N_OFF), spec3(N_OFF),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=spec3(3),
        out_shape=jax.ShapeDtypeStruct((3, rows, LANES), jnp.float32),
        scratch_shapes=[pltpu.SMEM((2, 16, CH), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(r_in, hits, s_r, e_r, photons_t)
    return out.reshape(3, n).T

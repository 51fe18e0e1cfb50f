"""Pallas TPU kernel: per-tile frustum-culled triangle lists for coherent
primary rays (the ganesha eye pass).

Primary rays in a camera-space scene all start at the exact origin
(camera.ml:93-102), so each 32x32 image tile spans a static view frustum and
a conservative per-tile potentially-visible-set of mesh triangles can be
built once on the host. The eye pass of an all-diffuse PPM scene is ONE
bounce (ppm.ml:330-343 only continues through speculars), so the whole
mesh-BVH walk for the eye pass collapses to: each 1024-ray block streams its
tile's culled triangle list (mean ~1.5k of 449k tris on the ganesha shell)
through a register Moller-Trumbore loop — the same listed-PVS design as the
sphere kernel's bounce-0 path (sphere_kernel._kernel_state_listed), extended
to streamed VMEM/SMEM triangle chunks because mesh lists are thousands of
entries, not dozens.

Reference semantics being replaced: the near-child-first BVH descent of
shape_tree.ml:198-220 over the ganesha mesh (ganesha/bin/main.ml:286-298).
MT epsilon/acceptance match ops/triangles.py and the walk kernels:
|det| >= 1e-6, 0 <= u <= 1, 0 <= v, u+v <= 1, t >= 0; strict t < best with
ascending-index lists, so ties resolve to the lowest triangle index (the
brute-force oracle's argmin rule).

Layout:
- flat tri table (16, R) f32: rows 0-2 = a, 3-5 = e1, 6-8 = e2, row 9 = the
  global (BVH-order) triangle index stored exactly as f32 (< 2^24); rows
  10-15 pad the sublane dim to 16 for TPU tiling. Columns are the per-tile
  culled lists, each padded to a CHUNK multiple with all-zero triangles
  (det = 0 -> never hit); one shared all-zero chunk at the end serves empty
  tiles and band-padding dummy chunks.
- grid = chunks; three scalar-prefetch arrays drive the block maps:
  chunk_src[i]  = column-block of the flat table to stream,
  chunk_tile[i] = ray/output block (one 32x32 tile = (8, 128) lanes),
  chunk_first[i] = 1 on a tile's first chunk (initializes the running min).
  Dummy chunks point at a dedicated trailing output block that callers drop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = np.float32(3.0e38)
_EPS = np.float32(1e-6)
TILE = 32
LANES = 128
BLOCK_ROWS = TILE * TILE // LANES  # 8
CHUNK = 256  # triangles streamed per grid step
_UNROLL = 8


def _kernel(cs_ref, ct_ref, cf_ref, tri_ref, d_ref,
            t_ref, u_ref, v_ref, i_ref):
    i = pl.program_id(0)

    @pl.when(cf_ref[i] == 1)
    def _init():
        t_ref[:] = jnp.full(t_ref.shape, BIG, jnp.float32)
        u_ref[:] = jnp.zeros(u_ref.shape, jnp.float32)
        v_ref[:] = jnp.zeros(v_ref.shape, jnp.float32)
        i_ref[:] = jnp.zeros(i_ref.shape, jnp.int32)

    d0, d1, d2 = d_ref[0], d_ref[1], d_ref[2]

    def one(j, bt, bu, bv, bi):
        # triangle params broadcast from the streamed chunk (origin-zero
        # MT: tvec = -a, so qvec = -(a x e1))
        ax, ay, az = tri_ref[0, j], tri_ref[1, j], tri_ref[2, j]
        e1x, e1y, e1z = tri_ref[3, j], tri_ref[4, j], tri_ref[5, j]
        e2x, e2y, e2z = tri_ref[6, j], tri_ref[7, j], tri_ref[8, j]
        gi = tri_ref[9, j].astype(jnp.int32)
        pvx = d1 * e2z - d2 * e2y
        pvy = d2 * e2x - d0 * e2z
        pvz = d0 * e2y - d1 * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv = 1.0 / det
        uu = -inv * (ax * pvx + ay * pvy + az * pvz)
        qvx = az * e1y - ay * e1z
        qvy = ax * e1z - az * e1x
        qvz = ay * e1x - ax * e1y
        vv = inv * (d0 * qvx + d1 * qvy + d2 * qvz)
        tt = inv * (e2x * qvx + e2y * qvy + e2z * qvz)
        ok = ((jnp.abs(det) >= _EPS) & (uu >= 0.0) & (uu <= 1.0)
              & (vv >= 0.0) & (uu + vv <= 1.0) & (tt >= 0.0) & (tt < bt))
        return (jnp.where(ok, tt, bt), jnp.where(ok, uu, bu),
                jnp.where(ok, vv, bv), jnp.where(ok, gi, bi))

    def body(k, carry):
        bt, bu, bv, bi = carry
        base = k * _UNROLL
        for s in range(_UNROLL):  # manual unroll (Mosaic: unroll=1 or full)
            bt, bu, bv, bi = one(base + s, bt, bu, bv, bi)
        return bt, bu, bv, bi

    init = (t_ref[:], u_ref[:], v_ref[:], i_ref[:])
    bt, bu, bv, bi = jax.lax.fori_loop(0, CHUNK // _UNROLL, body, init)
    t_ref[:] = bt
    u_ref[:] = bu
    v_ref[:] = bv
    i_ref[:] = bi


@functools.partial(jax.jit, static_argnames=("n_tiles", "interpret"))
def intersect_tile_tris_pallas(table, chunk_src, chunk_tile, chunk_first,
                               d_rows, n_tiles: int, interpret: bool = False):
    """Nearest mesh hit for tile-ordered primary rays.

    table: (16, R) f32 flat tri table, R a multiple of CHUNK.
    chunk_src/chunk_tile/chunk_first: (C,) int32 per-chunk maps (see module
    docstring); chunk_tile may reference block n_tiles (the dummy block).
    d_rows: (3, (n_tiles+1)*BLOCK_ROWS, LANES) tile-ordered unit directions
    (the +1 block feeds dummy chunks and is dropped).
    Returns (t, u, v, idx) each ((n_tiles+1)*BLOCK_ROWS, LANES); t = BIG on
    miss; callers drop the trailing dummy block.
    """
    assert table.shape[0] == 16 and table.shape[1] % CHUNK == 0
    n_chunks = chunk_src.shape[0]
    out_rows = (n_tiles + 1) * BLOCK_ROWS
    assert d_rows.shape == (3, out_rows, LANES), d_rows.shape

    tri_spec = pl.BlockSpec((16, CHUNK), lambda i, cs, ct, cf: (0, cs[i]),
                            memory_space=pltpu.SMEM)
    d_spec = pl.BlockSpec((3, BLOCK_ROWS, LANES),
                          lambda i, cs, ct, cf: (0, ct[i], 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BLOCK_ROWS, LANES),
                            lambda i, cs, ct, cf: (ct[i], 0),
                            memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32)
    i32 = jax.ShapeDtypeStruct((out_rows, LANES), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[tri_spec, d_spec],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
    )
    return pl.pallas_call(
        _kernel, grid_spec=grid_spec,
        out_shape=(f32, f32, f32, i32),
        interpret=interpret,
    )(chunk_src, chunk_tile, chunk_first, table, d_rows)


# ---------------------------------------------------------------------------
# Host-side build: conservative per-tile frustum culling
# ---------------------------------------------------------------------------


@dataclass
class TileTriTable:
    """Whole-image per-tile culled triangle lists in flat chunk layout."""

    table: np.ndarray  # (16, R) f32; last CHUNK columns are the zero chunk
    tile_chunk_start: np.ndarray  # (n_tiles+1,) int32 CSR over chunks
    tile_chunk_src: np.ndarray  # (total_chunks,) int32 column-block per chunk
    tx_n: int
    ty_n: int
    width: int
    height: int

    @property
    def zero_chunk(self) -> int:
        return self.table.shape[1] // CHUNK - 1


def _tile_planes(camera, width, height, tx_n, ty_n, flip_y=False):
    """(T, 5, 3) plane normals per tile. flip_y picks the consumer's film
    convention (LOAD-BEARING, see ops/frustum.py): the PPM eye pass maps
    cy = y/H with no flip (ppm.ml:311-315 flips at write time instead);
    the path tracer maps cy = 1 - y/H and needs flip_y=True."""
    from ..frustum import tile_frustum_planes

    return tile_frustum_planes(camera, width, height, tx_n, ty_n,
                               flip_y=flip_y, with_z_plane=True, tile=TILE)


def _tile_corner_dirs(camera, width, height, tx_n, ty_n, flip_y=False):
    """(T, 4, 3) f64 corner directions per tile, same film convention
    switch as _tile_planes. A planar tile's rays are exactly the conical
    hull of these 4 directions (ops/frustum.py)."""
    xs = np.arange(tx_n + 1) * (TILE / width)
    ys = np.arange(ty_n + 1) * (TILE / height)
    if flip_y:
        ys = 1.0 - ys
    cx = np.broadcast_to(xs[None, :], (ty_n + 1, tx_n + 1))
    cy = np.broadcast_to(ys[:, None], (ty_n + 1, tx_n + 1))
    dirs = np.stack([camera.lower_left_x + camera.view_x * cx,
                     camera.lower_left_y + camera.view_y * cy,
                     np.full(cx.shape, -1.0)], axis=-1)
    return np.stack([dirs[:-1, :-1], dirs[:-1, 1:], dirs[1:, :-1],
                     dirs[1:, 1:]], axis=2).reshape(-1, 4, 3)


def build_tile_tri_table(camera, tri_a, tri_e1, tri_e2,
                         width: int, height: int, bvh=None,
                         backface_cull: bool = False,
                         flip_y: bool = False) -> TileTriTable:
    """Conservative cull of every triangle's AABB against every 32x32 tile
    frustum (p-vertex vs inward halfspace), then gather the survivors into
    the flat chunk table. Indices stay ascending per tile so the kernel's
    strict-< running min reproduces the brute-force argmin.

    bvh (a MeshBVH over the SAME reordered tri arrays): cull via one
    stackless tree descent per tile in C++ (native.tile_cull_native) —
    a node failing a cone plane skips its whole subtree, so cost scales
    with survivors instead of n*T. The result is a conservative SUPERSET
    of the brute path's accepts (node slack + 1.2x leaf margins), which
    cannot change the kernel's strict-< argmin; leaf ranges are DFS-
    ordered so per-tile indices stay ascending.

    Fallback (no bvh / no toolchain): the whole cull is ONE f32 sgemm:
    [hi | lo | margin] (n, 7) times [relu(n); min(n, 0); 1] (7, T*5) —
    dots >= 0 is the p-vertex test with the per-triangle margin folded in
    as a constant-1 gemm column. (An f64 two-gemm formulation ran at
    reference-BLAS speed on this container's OpenBLAS — 165x slower than
    sgemm, 331 s for the 449k-tri shell.)"""
    tri_a = np.asarray(tri_a, np.float32)
    tri_e1 = np.asarray(tri_e1, np.float32)
    tri_e2 = np.asarray(tri_e2, np.float32)
    b = tri_a + tri_e1
    c = tri_a + tri_e2
    lo = np.minimum(np.minimum(tri_a, b), c)
    hi = np.maximum(np.maximum(tri_a, b), c)
    # per-triangle margin: covers the f32 gemm rounding and the f32-ray vs
    # f64-plane mismatch at frustum boundaries (both ~1e-6 relative) with
    # room to spare, while staying tiny vs the triangle scale
    scale = np.maximum(np.abs(hi), np.abs(lo)).max(axis=1)
    margin = (1e-5 * np.maximum(scale, 1.0) + 1e-6).astype(np.float32)

    tx_n = -(-width // TILE)
    ty_n = -(-height // TILE)
    planes = _tile_planes(camera, width, height, tx_n, ty_n,
                          flip_y=flip_y)  # (T,5,3)
    t_n = planes.shape[0]

    from ...native import alloc_big

    n = len(tri_a)
    keep = None
    if bvh is not None and n:
        from ...native import tile_cull_native
        keep = tile_cull_native(bvh.nodes_lo, bvh.nodes_hi, bvh.meta_np,
                                lo, hi, margin, planes)
    if keep is None:
        nmat = planes.reshape(t_n * 5, 3).T  # (3, T*5)
        hl = np.concatenate([hi, lo, margin[:, None]], axis=1)  # (n, 7)
        nm = np.concatenate([np.maximum(nmat, 0.0), np.minimum(nmat, 0.0),
                             np.ones((1, t_n * 5))],
                            axis=0).astype(np.float32)
        # big buffers via the raw-mmap allocator and reused across chunks:
        # jaxlib's THP-madvised arenas make first-touch faults on fresh
        # hundreds-of-MB numpy outputs ~80x slower (measured 30-40 s per
        # gemm on this container vs 0.26 s warm)
        keep = alloc_big((t_n, n), bool)  # tile-major: rows contiguous
        step = 65536
        dots = alloc_big((step, t_n * 5), np.float32)
        sb = alloc_big((step, t_n * 5), bool)
        for s in range(0, n, step):
            e = min(n, s + step)
            m = e - s
            # p-vertex: box meets {n.x>=0} iff hi.max(n,0)+lo.min(n,0) >= 0
            np.matmul(hl[s:e], nm, out=dots[:m])
            np.signbit(dots[:m], out=sb[:m])
            bad = sb[:m].reshape(m, t_n, 5).any(axis=2)
            keep[:, s:e] = (~bad).T

    idx_lists = [None] * t_n
    if backface_cull and n:
        # Drop triangles every ray in the tile's cone can only hit
        # BACK-facing: for a watertight mesh whose rays originate outside
        # (MeshBVH.watertight, the caller's contract), the nearest hit is
        # always on the outward side, so such rows can never win the
        # kernel's strict-< argmin. A tile's direction set is exactly the
        # conical hull of its 4 corner dirs, so min_i dot(n, c_i) > 0 is
        # an exact all-back-facing proof, not a heuristic. Winding
        # orientation comes from the mesh's signed volume (outward normals
        # iff positive), so the test is orientation-agnostic. Measured on
        # the 449k-tri ganesha shell at 600x600: 57.6% of tile-list rows
        # drop (tools/proto_backface_cull.py).
        corners = _tile_corner_dirs(camera, width, height, tx_n, ty_n,
                                    flip_y=flip_y)
        e1d = tri_e1.astype(np.float64)
        e2d = tri_e2.astype(np.float64)
        normals = np.cross(e1d, e2d)
        vol6 = float(np.einsum("ij,ij->", tri_a.astype(np.float64), normals))
        s_out = 1.0 if vol6 >= 0.0 else -1.0
    for t in range(t_n):
        idx = np.nonzero(keep[t])[0]
        if backface_cull and n and len(idx):
            d4 = (s_out * normals[idx]) @ corners[t].T  # (k, 4)
            # conservative fp margin: keep unless ALL corner dots are
            # positive beyond rounding doubt (degenerate tris keep)
            m = np.abs(normals[idx]).sum(1) * np.abs(corners[t]).sum(1).max()
            idx = idx[d4.min(axis=1) <= 1e-12 * np.maximum(m, 1e-300)]
        idx_lists[t] = idx
    counts = np.array([len(i) for i in idx_lists], np.int64)
    pad_counts = np.maximum(-(-counts // CHUNK) * CHUNK, CHUNK)
    starts = np.zeros(t_n + 1, np.int64)
    np.cumsum(pad_counts, out=starts[1:])
    r_total = int(starts[-1]) + CHUNK  # + shared zero chunk
    table = alloc_big((16, r_total), np.float32)
    table[:, :] = 0.0  # alloc_big's small-array path is uninitialized
    for t in range(t_n):
        idx = idx_lists[t]
        s0 = int(starts[t])
        k = len(idx)
        table[0:3, s0:s0 + k] = tri_a[idx].T
        table[3:6, s0:s0 + k] = tri_e1[idx].T
        table[6:9, s0:s0 + k] = tri_e2[idx].T
        table[9, s0:s0 + k] = idx  # exact in f32 (mesh < 2^24 tris)

    tile_chunk_start = (starts // CHUNK).astype(np.int32)
    total_chunks = int(tile_chunk_start[-1])
    chunk_src = np.empty(total_chunks, np.int32)
    zero_chunk = r_total // CHUNK - 1
    for t in range(t_n):
        s0, s1 = tile_chunk_start[t], tile_chunk_start[t + 1]
        if counts[t] == 0:
            chunk_src[s0:s1] = zero_chunk
        else:
            chunk_src[s0:s1] = np.arange(s0, s1)
    return TileTriTable(table=table, tile_chunk_start=tile_chunk_start,
                        tile_chunk_src=chunk_src, tx_n=tx_n, ty_n=ty_n,
                        width=width, height=height)


def band_chunk_maps(tt: TileTriTable, band_rows: int, min_bands: int = 0):
    """Per-band (chunk_src, chunk_tile, chunk_first) int32 arrays, all
    padded to the max chunk count across bands so one jitted eye pass
    serves every band. Tile rows beyond the image and padding dummies
    stream the shared zero chunk; dummies write the trailing output block.
    min_bands: emit at least this many bands (trailing all-dead bands for
    a fixed-size device ring — parallel/ppm_ring.py shards one band per
    device). Returns (list of (cs, ct, cf) per band, n_tiles_band)."""
    assert band_rows % TILE == 0, band_rows
    tile_rows_band = band_rows // TILE
    n_tiles_band = tile_rows_band * tt.tx_n
    n_bands = max(-(-tt.height // band_rows), min_bands)
    bands = []
    for bi in range(n_bands):
        cs_parts, ct_parts, cf_parts = [], [], []
        for tr in range(tile_rows_band):
            gr = bi * tile_rows_band + tr  # global tile row
            for tc in range(tt.tx_n):
                local = tr * tt.tx_n + tc
                if gr < tt.ty_n:
                    g = gr * tt.tx_n + tc
                    s0 = int(tt.tile_chunk_start[g])
                    s1 = int(tt.tile_chunk_start[g + 1])
                    src = tt.tile_chunk_src[s0:s1]
                else:  # below the image: one zero chunk initializes a miss
                    src = np.array([tt.zero_chunk], np.int32)
                k = len(src)
                cs_parts.append(src)
                ct_parts.append(np.full(k, local, np.int32))
                first = np.zeros(k, np.int32)
                first[0] = 1
                cf_parts.append(first)
        bands.append([np.concatenate(cs_parts), np.concatenate(ct_parts),
                      np.concatenate(cf_parts)])
    max_chunks = max(len(b[0]) for b in bands)
    for b in bands:
        pad = max_chunks - len(b[0])
        if pad:
            b[0] = np.concatenate([b[0],
                                   np.full(pad, tt.zero_chunk, np.int32)])
            b[1] = np.concatenate([b[1],
                                   np.full(pad, n_tiles_band, np.int32)])
            b[2] = np.concatenate([b[2], np.ones(pad, np.int32)])
    return [tuple(b) for b in bands], n_tiles_band


def lane_maps(width: int, band_rows: int, tx_n: int):
    """Static raster<->tile lane permutations for one band.

    Returns (src_lane ((n_tiles+1)*1024,) int32: the band-raster lane feeding
    each tile lane, clamped for out-of-width/dummy lanes; back_map
    (band_rows*width_padded_lanes,) int32: the tile lane owning each raster
    lane). Raster lanes are lane = y_local*width + x as in make_eye_pass."""
    tile_rows = band_rows // TILE
    n_tiles = tile_rows * tx_n
    tl = np.arange(n_tiles * TILE * TILE)
    tile_id = tl // (TILE * TILE)
    within = tl % (TILE * TILE)
    ly = within // TILE
    lx = within % TILE
    ty, tx = tile_id // tx_n, tile_id % tx_n
    y = ty * TILE + ly
    x = tx * TILE + lx
    src = np.where(x < width, y * width + np.minimum(x, width - 1),
                   0).astype(np.int32)
    src_lane = np.concatenate(
        [src, np.zeros(TILE * TILE, np.int32)])  # dummy block reads lane 0

    n_pix = band_rows * width
    lanes = -(-n_pix // 1024) * 1024
    rl = np.arange(lanes)
    ry = np.minimum(rl // width, band_rows - 1)  # pad lanes: clamp into band
    rx = np.minimum(rl % width, width - 1)
    rty, rtx = ry // TILE, rx // TILE
    rtile = rty * tx_n + rtx
    back = (rtile * TILE * TILE + (ry % TILE) * TILE
            + (rx % TILE)).astype(np.int32)
    return src_lane, back

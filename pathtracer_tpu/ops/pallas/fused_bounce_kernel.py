"""Pallas TPU kernel: one ENTIRE path-tracer bounce in a single kernel.

Fusion of sphere_kernel.intersect_regs (+ the per-tile-PVS listed variant)
with shade_kernel.shade_body: the winner's (at, idx) never leave the VPU
registers, so a bounce reads the (10, rows, 128) wavefront state once and
writes it once — the two-kernel pipeline additionally wrote at+idx to HBM,
re-read them plus the full state in the shade kernel, and paid a second
kernel dispatch. Per bounce this removes ~14 plane-streams of HBM traffic
(~35% of the bounce's total) and one launch; the arithmetic and its order
are IDENTICAL to the two-kernel path (the same helper functions trace the
same ops), so images are bit-identical — verified by
tests/test_shade_kernel.py::test_fused_bounce_matches_two_kernel and an
on-hardware A/B.

Reference analog: the OCaml integrator's single `scatter`-driven loop body
(path_tracer/src/integrator.ml:30-66) — intersection and shading were
never separate passes in the reference either; the two-kernel split was a
build-order artifact here, retired by this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sphere_kernel import (BIG, LANES, RAY_BLOCK, intersect_regs,
                            intersect_regs_listed)
from .shade_kernel import shade_body


def _kernel_fused(limb_ref, bg_ref, sph_ref, tab_ref, st_ref, off_ref,
                  rad_in_ref, out_st_ref, rad_ref, *, n_spheres, bg_mode,
                  origin_zero):
    any_alive = jnp.max(st_ref[9]) > 0.0
    # default outputs: passthrough state and accumulated radiance (dead
    # blocks skip both the sphere loop and the whole shading stage)
    out_st_ref[...] = st_ref[...]
    rad_ref[...] = rad_in_ref[...]

    @pl.when(any_alive)
    def _run():
        best_at, best_idx = intersect_regs(
            sph_ref, st_ref[0], st_ref[1], st_ref[2],
            st_ref[3], st_ref[4], st_ref[5], n_spheres, origin_zero)
        hit = (best_at < BIG) & (st_ref[9] > 0.0)
        shade_body(limb_ref, bg_ref, tab_ref, st_ref, off_ref, best_idx,
                   hit, rad_in_ref, out_st_ref, rad_ref, bg_mode)


def _kernel_fused_listed(limb_ref, bg_ref, sph_ref, list_ref, cnt_ref,
                         tab_ref, st_ref, off_ref, rad_in_ref, out_st_ref,
                         rad_ref, *, bg_mode, origin_zero):
    any_alive = jnp.max(st_ref[9]) > 0.0
    out_st_ref[...] = st_ref[...]
    rad_ref[...] = rad_in_ref[...]
    blk = pl.program_id(0)

    @pl.when(any_alive)
    def _run():
        best_at, best_idx = intersect_regs_listed(
            sph_ref, list_ref, cnt_ref, blk, st_ref[0], st_ref[1],
            st_ref[2], st_ref[3], st_ref[4], st_ref[5], origin_zero)
        hit = (best_at < BIG) & (st_ref[9] > 0.0)
        shade_body(limb_ref, bg_ref, tab_ref, st_ref, off_ref, best_idx,
                   hit, rad_in_ref, out_st_ref, rad_ref, bg_mode)


@functools.partial(jax.jit, static_argnames=("bg_mode", "origin_zero",
                                             "interpret"))
def fused_bounce_pallas(sph_table, state_rows, pack_table, off_rows, limbs,
                        bg_colors, rad_in=None, bg_mode=1,
                        origin_zero=False, block_lists=None,
                        interpret=False):
    """One full bounce (intersect + shade) over the (10, rows, LANES)
    wavefront state. Same contracts as intersect_state_pallas +
    shade_pallas chained, minus the at/idx intermediates:
    sph_table (4, S) SMEM sphere table; pack_table (10, Sq, 128) packed
    material table (VMEM-resident); off_rows (rows, LANES) uint32 LDS
    offsets; limbs (2, 2) uint32; bg_colors (2, 3); rad_in (3, rows,
    LANES) radiance accumulator (miss radiance added in-kernel);
    block_lists: optional per-1024-ray-block frustum-culled sphere lists
    (bounce 0 in tiled ray order). Returns (new_state, rad)."""
    _, rows, lanes = state_rows.shape
    assert lanes == LANES and (rows * LANES) % RAY_BLOCK == 0
    n_spheres = sph_table.shape[1]
    block_rows = RAY_BLOCK // LANES
    grid = rows // block_rows
    if rad_in is None:
        rad_in = jnp.zeros((3, rows, LANES), jnp.float32)

    def spec3(lead):
        return pl.BlockSpec((lead, block_rows, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    lane_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(pack_table.shape, lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (jax.ShapeDtypeStruct((10, rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((3, rows, LANES), jnp.float32))
    if block_lists is not None:
        lists, counts = block_lists
        assert lists.shape[0] == grid and counts.shape == (grid, 1), (
            lists.shape, counts.shape, grid)
        return pl.pallas_call(
            functools.partial(_kernel_fused_listed, bg_mode=bg_mode,
                              origin_zero=origin_zero),
            grid=(grid,),
            in_specs=[smem, smem, smem, smem, smem, tab_spec, spec3(10),
                      lane_spec, spec3(3)],
            out_specs=(spec3(10), spec3(3)),
            out_shape=out_shape,
            # update state and the radiance accumulator in place
            input_output_aliases={6: 0, 8: 1},
            interpret=interpret,
        )(limbs, bg_colors, sph_table, lists, counts, pack_table,
          state_rows, off_rows, rad_in)
    return pl.pallas_call(
        functools.partial(_kernel_fused, n_spheres=n_spheres,
                          bg_mode=bg_mode, origin_zero=origin_zero),
        grid=(grid,),
        in_specs=[smem, smem, smem, tab_spec, spec3(10), lane_spec,
                  spec3(3)],
        out_specs=(spec3(10), spec3(3)),
        out_shape=out_shape,
        input_output_aliases={4: 0, 6: 1},
        interpret=interpret,
    )(limbs, bg_colors, sph_table, pack_table, state_rows, off_rows,
      rad_in)

"""Bounce-synchronous megakernel path tracer.

TPU-native inversion of the reference's recursive per-pixel `trace_path`
(`path_tracer/src/integrator.ml:30-68`): the whole sample wavefront advances
one bounce at a time, carrying (origin, direction, attenuation, alive,
radiance) as SoA arrays; scatter events are masked selects; the film is
per-pixel radiance sums finished by one reconstruction conv + gamma.

Sampling parity with the reference (`integrator.ml:89-112`):
  - sampler dimension count D = 2 + 2*max_bounces
  - sample offset = y*W + x + pass*spp   (note `pass*spp`, NOT `pass*W*H` —
    a reference quirk that must be replicated for pixel parity)
  - dims (0,1) jitter the pixel; dims (2+2i, 3+2i) drive bounce i
  - cx = (x+dx)/W, cy = 1-(y+dy)/H; film splat lands on the sample's own
    pixel since write_sample truncates pixel+jitter coords (film_tile.ml:40-45)
Radiance identity: result = sum_i emit_i*prod(attn_<i) + prod(attn)*background
on miss; materials never emit (material.ml:59) so only the background term is
live in the path tracer.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import film
from .camera import Camera
from .ops import shading, spheres, vec
from .ops.lds import Sampler
from .scene import SphereScene, eval_texture

__all__ = ["trace", "make_pass_fn", "make_render_fn", "render_with_progress"]


def make_intersector(scene: SphereScene, backend: str, intersect_fn=None,
                     select_mode: str = "gather", mesh=None,
                     mesh_intersect=None):
    """Build hit_setup(org, d, alive) -> dict of per-lane hit attributes.

    Unifies sphere and triangle pools (the reference's Shape sum type,
    cornell-box/bin/main.ml:93-155): nearest hit across both, then all
    shading inputs (point, flipped normal, uv, material columns) are computed
    with masked selects. Shared by the path tracer and the photon mapper.
    """
    from .ops import triangles as tri_ops
    from .ops.pallas import sphere_kernel as sk
    from .scene import TRI_A, TRI_E1, TRI_E2, TRI_MAT, TRI_TEX

    custom_intersect = intersect_fn is not None
    if not custom_intersect:
        if backend.startswith("pallas"):
            tables = sk.pack_spheres_pallas(scene.center, scene.radius,
                                            scene.valid)
        else:
            packed = spheres.pack_for_intersect(scene.center, scene.radius,
                                                scene.valid)
    has_tris = scene.tri_count > 0
    tris_pallas = has_tris and backend.startswith("pallas")
    if has_tris:
        tp = scene.tri_pack
        if tris_pallas:
            from .ops.pallas import tri_kernel as tk
            tri_table = tk.pack_tris_pallas(tp[:, TRI_A], tp[:, TRI_E1],
                                            tp[:, TRI_E2], scene.tri_valid)
        else:
            tri_comps = tri_ops.pack_for_intersect(
                tp[:, TRI_A], tp[:, TRI_E1], tp[:, TRI_E2], scene.tri_valid)
    has_mesh = mesh is not None

    def hit_setup(org, d, alive, mesh_consts=None):
        """mesh_consts: the mesh's device arrays threaded through the jit
        boundary as arguments (MeshBVH.device_consts()) — closed-over
        arrays become HLO constants and multiply XLA compile time."""
        mc = mesh_consts or {}
        if custom_intersect:
            t_s, idx_s, hit_s = intersect_fn(scene, org, d)
            pk_rows = scene.shade_pack[idx_s]
        else:
            if backend.startswith("pallas"):
                at, idx_s, hit_s, inv_a = sk.intersect_spheres_pallas(
                    tables, org, d, alive,
                    interpret=(backend == "pallas_interpret"))
            else:
                at, idx_s, hit_s, inv_a = spheres.intersect_packed(
                    *packed, scene.valid, org, d)
            if select_mode == "onehot":
                pk_rows = spheres.onehot_select(idx_s, scene.count,
                                                scene.shade_pack)
            else:
                pk_rows = scene.shade_pack[idx_s]
            # stable per-ray t from the winner's params (sphere.ml:44-53)
            a = vec.quadrance(d)
            r_h = pk_rows[:, 3]
            t_s = spheres.stable_t(pk_rows[:, 0:3], r_h * r_h, org, d, a,
                                   inv_a)

        if has_tris:
            if tris_pallas:
                from .ops.pallas import tri_kernel as tk
                t_t, idx_t, hit_t = tk.intersect_tris_pallas(
                    tri_table, org, d, alive,
                    interpret=(backend == "pallas_interpret"))
            else:
                t_t, idx_t, hit_t = tri_ops.intersect_tris(tri_comps, org, d)
            tri_rows = scene.tri_pack[idx_t]
            use_tri = hit_t & (~hit_s | (t_t < t_s))
            hit = hit_s | hit_t
        else:
            use_tri = jnp.zeros(org.shape[:1], bool)
            hit = hit_s
        if has_mesh:
            t_cur = jnp.where(hit, jnp.where(use_tri, t_t, t_s) if has_tris
                              else t_s, spheres.BIG)
            if mesh_intersect is not None:
                # caller-supplied replacement walk (e.g. the tile-culled
                # primary-ray kernel, ops/pallas/tile_tri_kernel.py)
                t_m, u_m, v_m, idx_m, hit_m = mesh_intersect(org, d, alive)
            else:
                # cap the walk at the pool winner's t — the reference's
                # floor-then-mesh two-phase intersect passes the floor hit
                # as the mesh query's t_max (ganesha/bin/main.ml:286-298);
                # slab tests against the tighter bound prune whole subtrees
                # behind the analytic floor
                t_m, u_m, v_m, idx_m, hit_m = mesh.intersect(
                    org, d, t_max0=t_cur, active=alive,
                    table=mc.get("table"))
            use_mesh = hit_m & (t_m < t_cur)
            use_tri = use_tri & ~use_mesh
            hit = hit | hit_m

        # sphere attributes
        point_s = org + t_s[..., None] * d
        n_s = vec.normalize(point_s - pk_rows[:, 0:3])

        if has_tris:
            e1 = tri_rows[:, TRI_E1]
            e2 = tri_rows[:, TRI_E2]
            t_rt, u_b, v_b = tri_ops.mt_single(tri_rows[:, TRI_A], e1, e2,
                                               org, d)
            # reference hit point is the barycentric combination, not o+t*d
            # (triangle.ml:31-37)
            point_t = tri_rows[:, TRI_A] + u_b[:, None] * e1 + v_b[:, None] * e2
            n_t = vec.normalize(vec.cross(e1, e2))
            point = vec.where3(use_tri, point_t, point_s)
            g_normal = vec.where3(use_tri, n_t, n_s)
            t = jnp.where(use_tri, t_t, t_s)
        else:
            point, g_normal, t = point_s, n_s, t_s
        if has_mesh:
            tp9 = mc.get("tri_pack9")
            if tp9 is not None:
                # one plane-major gather for all 9 winner attributes (see
                # MeshBVH.device_consts on the ~7x gather-rate difference)
                cols = tp9[:, idx_m]  # (9, L)
                ma, me1, me2 = cols[0:3].T, cols[3:6].T, cols[6:9].T
            else:
                ma = mc.get("tri_a", mesh.tri_a)[idx_m]
                me1 = mc.get("tri_e1", mesh.tri_e1)[idx_m]
                me2 = mc.get("tri_e2", mesh.tri_e2)[idx_m]
            point_m = ma + u_m[:, None] * me1 + v_m[:, None] * me2
            n_m = vec.normalize(vec.cross(me1, me2))
            point = vec.where3(use_mesh, point_m, point)
            g_normal = vec.where3(use_mesh, n_m, g_normal)
            t = jnp.where(use_mesh, t_m, t)

        hit_front = vec.dot(d, g_normal) < 0.0
        normal = vec.where3(hit_front, g_normal, -g_normal)

        # sphere uv from the flipped normal (sphere.ml:25-33)
        ny = jnp.clip(normal[..., 1], -1.0, 1.0)
        theta = jnp.arccos(-ny)
        phi = np.float32(np.pi) + jnp.arctan2(-normal[..., 2], normal[..., 0])
        u_tex = phi * np.float32(0.5 / np.pi)
        v_tex = theta * np.float32(1.0 / np.pi)
        mat_rows = pk_rows[:, 4:16]
        if has_tris:
            # triangle uv: barycentric interpolation (triangle.ml:47-57)
            tx = tri_rows[:, TRI_TEX]
            w_b = 1.0 - u_b - v_b
            tri_u = tx[:, 0] * w_b + tx[:, 2] * u_b + tx[:, 4] * v_b
            tri_v = tx[:, 1] * w_b + tx[:, 3] * u_b + tx[:, 5] * v_b
            u_tex = jnp.where(use_tri, tri_u, u_tex)
            v_tex = jnp.where(use_tri, tri_v, v_tex)
            mat_rows = jnp.where(use_tri[:, None], tri_rows[:, TRI_MAT],
                                 mat_rows)
        if has_mesh:
            # mesh tex coords are the fixed (t00, t01, t11) corners
            # (ganesha/bin/main.ml:105-106): tu = v, tv = u+v
            u_tex = jnp.where(use_mesh, v_m, u_tex)
            v_tex = jnp.where(use_mesh, u_m + v_m, v_tex)
            mat_rows = jnp.where(use_mesh[:, None],
                                 mc.get("mat_row", mesh.mat_row)[None, :],
                                 mat_rows)

        albedo = eval_texture(mat_rows[:, 1], mat_rows[:, 2:5],
                              mat_rows[:, 5:8], mat_rows[:, 8], mat_rows[:, 9],
                              u_tex, v_tex)
        return dict(hit=hit, t=t, point=point, normal=normal,
                    hit_front=hit_front, albedo=albedo,
                    mat_kind=mat_rows[:, 0], ior=mat_rows[:, 10],
                    ior_inv=mat_rows[:, 11])

    return hit_setup


def trace(scene: SphereScene, sampler: Sampler, org, d, offset, max_bounces: int,
          background: Callable, intersect_fn=None, select_mode: str = "gather",
          backend: str | None = None, alive0=None, mesh=None,
          mesh_consts=None, origin_zero: bool = False, block_lists0=None,
          raw_planes: bool = False, mesh_intersect0=None):
    """Trace a wavefront of rays to completion; returns (radiance (N,3),
    segments traced (scalar int32)). raw_planes: the fused-kernel path MAY
    return radiance as (3, N//128, 128) planes instead (callers must
    accept either; see _trace_pallas2).

    select_mode: how the winning sphere's shading params reach the rays —
    "gather" (scene.shade_pack[idx]) or "onehot" (MXU row-select matmul).
    backend: "pallas" (TPU VPU kernel for the intersection — the Rust-AVX
    analog), "xla" (fused jnp), or None = pallas on TPU else xla.
    """
    from .ops import quat as quat_ops
    from .ops.pallas import sphere_kernel as sk

    if backend is None:
        backend = "pallas2" if jax.default_backend() == "tpu" else "xla"
    if backend.startswith("pallas2"):
        usable = (intersect_fn is None and scene.tri_count == 0
                  and mesh is None
                  and getattr(background, "pallas_params", None) is not None)
        if usable:
            return _trace_pallas2(scene, sampler, org, d, offset, max_bounces,
                                  background, alive0,
                                  interpret=(backend == "pallas2_interpret"),
                                  origin_zero=origin_zero,
                                  block_lists0=block_lists0,
                                  raw_planes=raw_planes)
        # fall back to the composite kernel tier, PRESERVING interpret
        # mode (losing it made every pallas2_interpret fallback crash on
        # CPU with "Only interpret mode is supported")
        backend = ("pallas_interpret" if backend == "pallas2_interpret"
                   else "pallas")

    n = org.shape[0]
    dtype = org.dtype
    # the pallas kernel wants ray-count a multiple of its block; pad with
    # dead rays (alive=False from the start, sliced off at the end)
    n_pad = ((-n) % sk.RAY_BLOCK
             if (intersect_fn is None and backend.startswith("pallas")) else 0)
    if n_pad:
        org = jnp.concatenate([org, jnp.zeros((n_pad, 3), dtype)])
        d = jnp.concatenate([d, jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], dtype), (n_pad, 3))])
        offset = jnp.concatenate([offset, jnp.zeros((n_pad,), offset.dtype)])
    np_tot = n + n_pad
    attn = jnp.ones((np_tot, 3), dtype)
    rad = jnp.zeros((np_tot, 3), dtype)
    alive = jnp.arange(np_tot) < n if n_pad else jnp.ones((np_tot,), bool)
    if alive0 is not None:
        alive0_p = (jnp.concatenate([alive0, jnp.zeros((n_pad,), bool)])
                    if n_pad else alive0)
        alive = alive & alive0_p
    segments = jnp.zeros((), jnp.int32)
    hit_setup = make_intersector(scene, backend, intersect_fn, select_mode,
                                 mesh=mesh)
    # bounce 0 may swap the mesh-BVH walk for the tile-culled primary-ray
    # kernel (ops/pallas/tile_tri_kernel.py): tile-major origin-zero rays
    # only, so callers gate it; padding would break the tile/block match
    hit_setup0 = hit_setup
    if mesh_intersect0 is not None and mesh is not None and not n_pad:
        hit_setup0 = make_intersector(scene, backend, intersect_fn,
                                      select_mode, mesh=mesh,
                                      mesh_intersect=mesh_intersect0)

    def bounce_step(bounce, org, d, attn, rad, alive, segments, offset):
        """One bounce at whatever (static) lane width the args carry."""
        segments = segments + jnp.sum(alive.astype(jnp.int32))
        h = (hit_setup0 if bounce == 0 else hit_setup)(org, d, alive,
                                                       mesh_consts)
        hit = h["hit"] & alive
        miss = alive & ~hit
        rad = rad + vec.where3(miss, attn * background(d),
                               jnp.zeros_like(rad))

        q = shading.shader_quat(h["normal"])
        omega_i = quat_ops.rotate(q, -d)
        u = sampler.get(offset, 2 + 2 * bounce)
        v = sampler.get(offset, 3 + 2 * bounce)
        wo, attn_mult, ok = shading.scatter(
            h["mat_kind"], h["albedo"], h["ior"], h["ior_inv"],
            omega_i, h["hit_front"], u, v)

        dir_world = quat_ops.rotate_inv(q, wo)
        new_org = shading.world_ray(h["point"], dir_world)

        alive2 = hit & ok
        org = vec.where3(alive2, new_org, org)
        d = vec.where3(alive2, dir_world, d)
        attn = jnp.where(alive2[..., None], attn * attn_mult, attn)
        return org, d, attn, rad, alive2, segments

    # Mesh-walk lane compaction (the path-traced analog of ppm.py's
    # specular-walk ladder): a mesh scene's lanes die as they escape to
    # the sky — measured on ganesha (tools/profile_ganesha_pt.py,
    # 600x600 spp=8): ~94% live at bounce 1 but ~35% by bounce 2 and
    # <10% by bounce 4. At each compaction bounce the live lanes are
    # argsort-packed to the front and the remaining bounces run inside a
    # lax.switch branch whose arrays are PHYSICALLY 1/divisor of the
    # wavefront (rounded up to the kernel block); an overflow of live
    # lanes falls back to the full-width branch, so any plan is safe.
    # Per-lane math is unchanged. DEFAULT OFF: hardware A/B at the
    # ganesha_pt config (plan 2:2,4:8) measured 0.653 s vs 0.646 s
    # uncompacted with identical segments — the walk driver's coherence
    # sort already packs dead lanes into tail chunks whose while-loops
    # exit in one step, so shrinking the physical width only re-buys
    # that with extra argsort/scatter/switch overhead (same verdict as
    # the cornell eye-walk ladder, tools/ab_eye_compact.py).
    # PATHTRACER_PT_COMPACT: "bounce:divisor,..." enables the ladder
    # ("0"/unset = off; malformed values are ignored).
    compact_plan = ()
    if mesh is not None and max_bounces > 2:
        env = os.environ.get("PATHTRACER_PT_COMPACT", "")
        plan = []
        if env and env != "0":
            try:
                plan = [(int(kv.split(":")[0]), int(kv.split(":")[1]))
                        for kv in env.split(",")]
            except (ValueError, IndexError):
                pass
        compact_plan = tuple(sorted(dict(
            (b, dv) for b, dv in plan
            if 1 <= b < max_bounces and dv > 1).items()))

    blk = (sk.RAY_BLOCK
           if (intersect_fn is None and backend.startswith("pallas")) else 8)

    def compact_run(b0, b1, dv, org, d, attn, rad, alive, segments, offset):
        p = -(-max(np_tot // dv, 1) // blk) * blk
        if p >= np_tot:  # divisor too shallow to shrink: run plain
            for b in range(b0, b1):
                org, d, attn, rad, alive, segments = bounce_step(
                    b, org, d, attn, rad, alive, segments, offset)
            return org, d, attn, rad, alive, segments
        n_live = jnp.sum(alive.astype(jnp.int32))
        # stable: live lanes keep their relative (tile) order, preserving
        # the spatial coherence the walk driver's chunking relies on
        perm = jnp.argsort(jnp.where(alive, 0, 1).astype(jnp.int32))

        def full_branch(org_f, d_f, attn_f, offset_f):
            o2, d2, a2 = org_f, d_f, attn_f
            r2 = jnp.zeros_like(rad)
            al2, s2 = alive, jnp.zeros((), jnp.int32)
            for b in range(b0, b1):
                o2, d2, a2, r2, al2, s2 = bounce_step(
                    b, o2, d2, a2, r2, al2, s2, offset_f)
            return o2, d2, a2, r2, al2, s2

        def prefix_branch(org_f, d_f, attn_f, offset_f):
            idx = perm[:p]
            o2, d2, a2 = org_f[idx], d_f[idx], attn_f[idx]
            r2 = jnp.zeros((p, 3), org_f.dtype)
            al2, s2 = alive[idx], jnp.zeros((), jnp.int32)
            off2 = offset_f[idx]
            for b in range(b0, b1):
                o2, d2, a2, r2, al2, s2 = bounce_step(
                    b, o2, d2, a2, r2, al2, s2, off2)
            # scatter the prefix back over the full wavefront; lanes
            # outside the prefix are dead (n_live <= p on this branch),
            # so passthrough keeps them exactly
            return (org_f.at[idx].set(o2), d_f.at[idx].set(d2),
                    attn_f.at[idx].set(a2),
                    jnp.zeros_like(rad).at[idx].set(r2),
                    jnp.zeros((np_tot,), bool).at[idx].set(al2), s2)

        sel = (n_live <= p).astype(jnp.int32)
        o, dd, a, r_delta, al, s_delta = lax.switch(
            sel, [full_branch, prefix_branch], org, d, attn, offset)
        # deltas: live lanes enter a stage with rad == 0 (radiance only
        # accrues on the terminating miss), so adding is exact
        return o, dd, a, rad + r_delta, al, segments + s_delta

    cuts = [b for b, _ in compact_plan]
    div = dict(compact_plan)
    starts = [0] + cuts
    ends = cuts + [max_bounces]
    for b0, b1 in zip(starts, ends):
        if b1 <= b0:
            continue
        if b0 in div:
            org, d, attn, rad, alive, segments = compact_run(
                b0, b1, div[b0], org, d, attn, rad, alive, segments, offset)
        else:
            for bounce in range(b0, b1):
                org, d, attn, rad, alive, segments = bounce_step(
                    bounce, org, d, attn, rad, alive, segments, offset)
    if n_pad:
        rad = rad[:n]
    return rad, segments


def _default_compact_at(max_bounces):
    """Measured compaction schedule (tools/sweep_knobs.py on the v5e chip,
    post tile-PVS balance): shallow configs want a single compaction at
    bounce 3 (canonical spp=32/b=8: 68.05 vs 63.54 at (2,) and 59-61 at
    (2,4)); deep configs keep (2,4) so the late <2%-live tail re-selects
    into the small bucket (HQ spp=512/b=16: 67.75 with (2,4)). Env knob
    PATHTRACER_COMPACT_AT overrides both."""
    env = os.environ.get("PATHTRACER_COMPACT_AT")
    if env is not None:
        try:
            return tuple(int(x) for x in env.split(",") if x.strip())
        except ValueError:  # malformed knob must not break renders
            pass
    return (3,) if max_bounces <= 8 else (2, 4)


def _trace_pallas2(scene, sampler, org, d, offset, max_bounces, background,
                   alive0, compact_at=None, interpret=False,
                   origin_zero=False, block_lists0=None, raw_planes=False):
    """Fully fused two-kernel bounce loop (sphere scenes only): Pallas
    intersection + Pallas shading, state kept transposed (10, N) across
    bounces so each bounce reads/writes it exactly once.

    Lane compaction (the wavefront-architecture half of the reference's
    native-tier throughput story): at the bounces in `compact_at`, dead
    lanes' accumulated radiance is flushed back to original-order pixels
    (cheap gathers via the closed-form dest map — the restore direction
    needs no scatter) and the live lanes are stable-partitioned to the
    front of the wavefront so the intersection kernel's block early-exit
    skips the dead tail. Measured lane occupancy collapses to ~29% by
    bounce 2 while 87% of blocks stay live (tools/measure_occupancy.py);
    compaction converts that gap into skipped blocks.
    """
    from .ops.pallas import compact_kernel as ck
    from .ops.pallas import sphere_kernel as sk
    from .ops.pallas import shade_kernel as shk

    if compact_at is None:
        compact_at = _default_compact_at(max_bounces)
    compact_at = frozenset(b for b in compact_at if 0 < b < max_bounces)

    n = org.shape[0]
    n_pad = (-n) % sk.RAY_BLOCK
    if n_pad:
        org = jnp.concatenate([org, jnp.zeros((n_pad, 3), org.dtype)])
        d = jnp.concatenate([d, jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], org.dtype), (n_pad, 3))])
        offset = jnp.concatenate([offset, jnp.zeros((n_pad,), offset.dtype)])
    np_tot = n + n_pad
    alive = jnp.arange(np_tot) < n
    if alive0 is not None:
        alive0_p = (jnp.concatenate([alive0, jnp.zeros((n_pad,), bool)])
                    if n_pad else alive0)
        alive = alive & alive0_p

    # NOTE: the clustered kernel (intersect_clustered_pallas) loses badly at
    # this scene size — each block-level cull is a vector->scalar sync that
    # drains the VPU pipeline (~2us), and a 16-sphere cluster only guards
    # ~0.3us of work. Revisit for scenes with >= tens of thousands of
    # primitives where clusters can be hundreds wide.
    tables = sk.pack_spheres_pallas(scene.center, scene.radius, scene.valid)
    # packed material table (10, S): the per-bounce winner gather streams
    # 10 planes instead of the 16 raw shade_pack columns
    pack_t = shk.pack_material_tables(scene.shade_pack)
    bg_mode, bg_colors = background.pallas_params
    bg_colors = jnp.asarray(bg_colors, jnp.float32)

    rows = np_tot // sk.LANES
    if (block_lists0 is not None
            and block_lists0[0].shape[0] != np_tot // sk.RAY_BLOCK):
        block_lists0 = None  # caller's layout isn't the tile grid
    state = jnp.concatenate(
        [org.T, d.T, org.T * 0.0 + 1.0,
         alive[None].astype(jnp.float32)]).reshape(10, rows, sk.LANES)
    off_rows = offset.reshape(rows, sk.LANES)
    rad_t = jnp.zeros((3, rows, sk.LANES), jnp.float32)
    segments = jnp.zeros((), jnp.int32)
    hi = np.asarray(sampler.hi)
    lo = np.asarray(sampler.lo)

    flush = jnp.zeros((3, rows, sk.LANES), jnp.float32)

    # single fused intersect+shade kernel per bounce (the default): the
    # winner's at/idx stay in registers instead of round-tripping HBM
    # between two kernels. PATHTRACER_FUSE_BOUNCE=0 restores the
    # two-kernel pipeline for A/B (bit-identical by construction).
    fuse_bounce = os.environ.get("PATHTRACER_FUSE_BOUNCE", "1") != "0"

    def bounce_step(state, rad_t, off_rows, bounce):
        """One intersect+shade bounce at whatever (static) size `state` has."""
        # bounce 0 in tiled ray order: per-tile frustum-culled sphere lists
        # (block layout only matches the tile grid before any compaction,
        # and compact_at bounces are all > 0)
        bl = block_lists0 if bounce == 0 else None
        du, dv = 2 + 2 * bounce, 3 + 2 * bounce
        limbs = jnp.asarray([[hi[du], lo[du]], [hi[dv], lo[dv]]], jnp.uint32)
        if fuse_bounce:
            from .ops.pallas import fused_bounce_kernel as fbk
            return fbk.fused_bounce_pallas(
                tables, state, pack_t, off_rows, limbs, bg_colors,
                rad_in=rad_t, bg_mode=bg_mode,
                origin_zero=(origin_zero and bounce == 0),
                block_lists=bl, interpret=interpret)
        at, idx = sk.intersect_state_pallas(
            tables, state, interpret=interpret,
            origin_zero=(origin_zero and bounce == 0), block_lists=bl)
        st2, rad_new = shk.shade_pallas(state, pack_t, idx, off_rows, at,
                                        limbs, bg_colors, rad_in=rad_t,
                                        bg_mode=bg_mode,
                                        interpret=interpret)
        return st2, rad_new

    c1 = min(compact_at) if compact_at else max_bounces
    for bounce in range(c1):
        segments = segments + jnp.sum((state[9] > 0.0).astype(jnp.int32))
        state, rad_t = bounce_step(state, rad_t, off_rows, bounce)

    # raw_planes: return radiance sums in the kernels' native (3, rows,
    # LANES) plane layout — the caller accumulates across passes in this
    # layout and transposes ONCE after the scan. The per-pass
    # reshape(3,N).T below materializes a (N, 3) array whose 3-wide minor
    # dim tiles terribly on TPU (profiled at ~0.4 ms/pass of transpose +
    # layout copies at the canonical config). Only taken when the caller's
    # ray count is already block-aligned (the tiled path always is).
    raw_planes = raw_planes and n_pad == 0

    if not compact_at:
        flush = flush + rad_t
        if raw_planes:
            return flush, segments
        rad = flush.reshape(3, np_tot).T
        return (rad[:n] if n_pad else rad), segments

    # --- first compaction: flush all radiance home, pack live lanes ---
    flush = flush + rad_t  # still in original order (chain empty)
    alive1 = (state[9] > 0.0).reshape(-1)
    st_c, off_c, k1 = ck.compact_blocks(state, off_rows, interpret=interpret)
    state, off_rows, n_live_rows = ck.pack_rows(st_c, off_c, k1)
    dest1 = ck.dest_map(alive1.reshape(rows, sk.LANES), k1)

    # --- remaining bounces run inside a lax.switch branch whose arrays are
    # PHYSICALLY the branch's static prefix size: the dead tail is neither
    # streamed by the kernels nor touched by the pk gather / XLA glue (the
    # earlier per-bounce dynamic_update_slice variant copied the full state
    # every bounce and regressed). Occupancy collapses to ~30% of lanes by
    # bounce 2 (tools/measure_occupancy.py), so the 1/2 branch is typical.
    def make_buckets():
        # 5 sizes (1, 1/2, 1/4, 1/8, 1/16): occupancy is ~30% by bounce 2
        # and <2% by the deep HQ bounces; the inner re-selection below
        # lets the tail bounces drop to the small prefixes
        sizes, b = [rows], rows // 2
        while b * sk.LANES >= sk.RAY_BLOCK and len(sizes) < 5:
            sizes.append(-(-b // 8) * 8)
            b //= 2
        return sizes

    bucket_sizes = make_buckets()
    rest = sorted(b for b in compact_at if b > c1)
    # inner re-selection pays a ~0.4 ms lax.switch operand-copy toll per
    # pass (measured: 57.4 -> 54.7 Mrays/s at the canonical config when
    # always on), so it only runs when the post-compaction tail is long
    # enough to win it back (the HQ b=16 configs)
    last_c = rest[-1] if rest and (max_bounces - rest[-1]) >= 6 else None

    def range_branch(prefix):
        def br(state_full, off_full):
            st = state_full[:, :prefix]
            off = off_full[:prefix]
            rad = jnp.zeros((3, prefix, sk.LANES), jnp.float32)
            segs = jnp.zeros((), jnp.int32)
            fl = jnp.zeros((3, rows, sk.LANES), jnp.float32)
            chain2 = []  # local compactions at prefix scale

            def to_orig(x3):
                # NOTE the gather-then-select shape is load-bearing: an
                # attempt to drop the f32x3 select by padding x with a zero
                # lane and routing dead lanes' indices there (s32 where on
                # the index instead) made XLA fuse the index arithmetic
                # into the gather and the gather went 0.35 -> 2.8 ms/pass
                # (hardware, canonical config; whole render 147 -> 221 ms).
                # Keep the plain x[:, map] + where(mask) idiom.
                x = x3.reshape(3, -1)
                for ap, dd in reversed(chain2):
                    x = jnp.where(ap[None, :], x[:, dd], 0.0)
                x = jnp.where(alive1[None, :], x[:, dest1], 0.0)
                return x.reshape(3, rows, sk.LANES)

            for bounce in range(c1, last_c if last_c is not None
                                else max_bounces):
                # when last_c is None every `rest` bounce compacts here
                if bounce in rest:
                    fl_new = fl + to_orig(rad)
                    rad = jnp.zeros_like(rad)
                    ap = (st[9] > 0.0)
                    stc, offc, k2 = ck.compact_blocks(st, off,
                                                      interpret=interpret)
                    st, off, _ = ck.pack_rows(stc, offc, k2)
                    chain2.append((ap.reshape(-1), ck.dest_map(ap, k2)))
                    fl = fl_new
                segs = segs + jnp.sum((st[9] > 0.0).astype(jnp.int32))
                st, rad = bounce_step(st, rad, off, bounce)

            if last_c is not None:
                # final compaction RE-SELECTS the prefix for the tail
                # bounces with an inner switch (round 3): occupancy keeps
                # collapsing, so the tail runs at 1/8- or 1/16-size
                # prefixes instead of inheriting this branch's
                fl = fl + to_orig(rad)
                ap = (st[9] > 0.0)
                stc, offc, k2 = ck.compact_blocks(st, off,
                                                  interpret=interpret)
                st, off, n_live2 = ck.pack_rows(stc, offc, k2)
                chain2.append((ap.reshape(-1), ck.dest_map(ap, k2)))
                inner_sizes = [p for p in bucket_sizes if p <= prefix]

                def inner_branch(p2):
                    def ib(st_in, off_in):
                        st2 = st_in[:, :p2]
                        off2 = off_in[:p2]
                        rad2 = jnp.zeros((3, p2, sk.LANES), jnp.float32)
                        sg = jnp.zeros((), jnp.int32)
                        for b2 in range(last_c, max_bounces):
                            sg = sg + jnp.sum(
                                (st2[9] > 0.0).astype(jnp.int32))
                            st2, rad2 = bounce_step(st2, rad2, off2, b2)
                        padr = prefix - p2
                        if padr:
                            rad2 = jnp.concatenate(
                                [rad2, jnp.zeros((3, padr, sk.LANES),
                                                 jnp.float32)], axis=1)
                        return rad2, sg
                    return ib

                isel = sum((n_live2 <= p).astype(jnp.int32)
                           for p in inner_sizes[1:])
                rad, sg2 = lax.switch(
                    isel, [inner_branch(p) for p in inner_sizes], st, off)
                segs = segs + sg2
            fl = fl + to_orig(rad)
            return fl, segs
        return br

    sel = sum((n_live_rows <= b).astype(jnp.int32) for b in bucket_sizes[1:])
    fl, segs2 = lax.switch(sel, [range_branch(b) for b in bucket_sizes],
                           state, off_rows)
    flush = flush + fl
    segments = segments + segs2
    if raw_planes:
        return flush, segments
    rad = flush.reshape(3, np_tot).T
    if n_pad:
        rad = rad[:n]
    return rad, segments


TILE = 32  # pixels per side of an image tile in tiled ray order


def tile_sphere_lists(camera, center, radius, valid, width, height,
                      tile_rows=None):
    """Frustum-cull the sphere set per 32x32 image tile (host numpy, f64).

    Bounce-0 rays in tiled ray order give each 1024-ray kernel block exactly
    one image tile, and every primary ray starts at the camera-space origin —
    so a tile's rays all lie inside the cone hulled by its 4 corner
    directions, and a per-tile potentially-visible-set is static for the
    whole render. This is the TPU-block-granularity equivalent of the
    reference BVH's per-ray descent (shape_tree.ml:198-220): the brute-force
    kernel loop shrinks from the whole scene to the ~handful of spheres whose
    cone test passes.

    Returns (lists (tyn*txn, K) int32, counts (tyn*txn, 1) int32): ascending
    global sphere indices per tile (ascending keeps the strict-< argmin's
    tie-breaking identical to the brute-force kernel), counts padded to a
    multiple of LIST_UNROLL with duplicated entries (a duplicate re-test can
    never steal the strict-< min, so padding is exact, not approximate)."""
    from .ops.pallas.sphere_kernel import LIST_UNROLL

    center = np.asarray(center, np.float64)
    radius = np.asarray(radius, np.float64)
    valid = np.asarray(valid, bool)
    # tile_rows > ceil(height/TILE) pads the grid for sharded bands whose
    # last band overhangs the image bottom (dead tiles get real, unused
    # cones — their blocks early-exit on alive anyway)
    tyn = tile_rows if tile_rows is not None else -(-height // TILE)
    txn = -(-width // TILE)
    # flip_y=True: the path tracer's film map is cy = 1 - y/H (the PPM eye
    # pass uses the unflipped convention; see ops/frustum.py)
    from .ops.frustum import tile_frustum_planes
    planes = tile_frustum_planes(camera, width, height, txn, tyn,
                                 flip_y=True, tile=TILE)  # (T, 4, 3)
    # conservative margin: kernel directions are f32 while the cone is f64
    r_eff = radius + 1e-4 * (1.0 + np.linalg.norm(center, axis=1))
    dist = np.einsum("tpk,sk->tps", planes, center)  # (T, 4, S)
    vis = (dist >= -r_eff[None, None, :]).all(axis=1) & valid[None, :]
    counts = vis.sum(axis=1)
    k_pad = max(int(-(-counts.max() // LIST_UNROLL)) * LIST_UNROLL,
                LIST_UNROLL)
    t_n = vis.shape[0]
    lists = np.zeros((t_n, k_pad), np.int32)
    counts_pad = np.zeros((t_n, 1), np.int32)
    for t in range(t_n):
        idx = np.nonzero(vis[t])[0]
        c = len(idx)
        cp = -(-c // LIST_UNROLL) * LIST_UNROLL if c else 0
        lists[t, :c] = idx
        if cp > c:
            lists[t, c:cp] = idx[0]
        counts_pad[t, 0] = cp
    return lists, counts_pad


def make_pass_fn(camera: Camera, background: Callable, width: int, height: int,
                 spp: int, max_bounces: int, dtype=jnp.float32, intersect_fn=None,
                 dynamic_rows: bool = False, select_mode: str = "gather",
                 backend: str | None = None, tiled: bool | None = None,
                 mesh=None, band_tile_rows: int | None = None):
    """Build pass_fn(scene, pass_idx[, row_ids]) -> (radiance sums, segments).

    With dynamic_rows=True the pass_fn takes a traced (R,) int32 array of
    global row indices and returns (R, W, 3) sums — this is the unit of
    image-space sharding for `shard_map` (the tile analog, integrator.ml:132).

    tiled (default on for the pallas backend): trace rays in 32x32-image-tile
    order so each 1024-ray kernel block is one spatially compact tile — dead
    paths cluster (whole sky tiles die at bounce 0) and the kernel's
    per-block early-exit actually fires. The reference's Tile.split work
    decomposition (tile.ml:28-39) reborn as a SIMD-coherence layout.

    band_tile_rows (tiled only): return band_pass_fn(scene, pass_idx,
    tile_row0[, mesh_consts]) -> ((band_tile_rows*TILE, W, 3), segs), a
    band of tile-rows starting at TRACED tile-row index tile_row0 — the
    unit of image-space sharding for the TILED pass, so multi-chip runs
    the same tuned layout as single-chip (rows past the image bottom are
    dead lanes contributing zero).
    """
    sampler = Sampler(2 + 2 * max_bounces)
    xs = np.arange(width)
    xf32 = xs.astype(np.float32)
    inv_w = np.float32(1.0 / width)
    inv_h = np.float32(1.0 / height)
    if tiled is None:
        import jax as _jax
        tiled = (not dynamic_rows and backend != "xla"
                 and _jax.default_backend() == "tpu")

    if tiled:
        hp = -(-height // TILE) * TILE
        wp = -(-width // TILE) * TILE
        tyn, txn = hp // TILE, wp // TILE
        ty, tx, iy, ix = np.meshgrid(np.arange(tyn), np.arange(txn),
                                     np.arange(TILE), np.arange(TILE),
                                     indexing="ij")
        y_ord = (ty * TILE + iy).transpose(0, 1, 2, 3).reshape(-1)
        x_ord = (tx * TILE + ix).reshape(-1)
        valid_ord = (y_ord < height) & (x_ord < width)
        y_c = np.minimum(y_ord, height - 1)
        x_c = np.minimum(x_ord, width - 1)
        pix_ord = (y_c * width + x_c).astype(np.uint32)

        def untile(rad_flat):
            """(tyn*txn*TILE*TILE, 3) tile-major -> (H, W, 3)."""
            img = rad_flat.reshape(tyn, txn, TILE, TILE, 3)
            img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(hp, wp, 3)
            return img[:height, :width]

        if band_tile_rows is not None:
            bt = band_tile_rows
            tyb, txb, iyb, ixb = np.meshgrid(
                np.arange(bt), np.arange(txn), np.arange(TILE),
                np.arange(TILE), indexing="ij")
            y_loc = (tyb * TILE + iyb).reshape(-1).astype(np.int32)
            x_ord_b = (txb * TILE + ixb).reshape(-1)
            x_valid = x_ord_b < width
            x_cb = np.minimum(x_ord_b, width - 1)

            def band_pass_fn(scene: SphereScene, pass_idx, tile_row0,
                             mesh_consts=None, block_lists=None):
                if block_lists is not None:
                    # slice this band's tile rows out of the full-grid lists
                    lists, counts = block_lists
                    r0 = jnp.asarray(tile_row0, jnp.int32) * txn
                    block_lists = (
                        lax.dynamic_slice(lists, (r0, 0),
                                          (bt * txn, lists.shape[1])),
                        lax.dynamic_slice(counts, (r0, 0), (bt * txn, 1)))
                pass_idx = jnp.asarray(pass_idx)
                lead = pass_idx.shape
                y_glob = (jnp.asarray(tile_row0, jnp.int32) * TILE
                          + jnp.asarray(y_loc))
                valid = (y_glob < height) & jnp.asarray(x_valid)
                y_cb = jnp.minimum(y_glob, height - 1)
                pix = (y_cb.astype(jnp.uint32) * np.uint32(width)
                       + jnp.asarray(x_cb, jnp.uint32))
                poff = (pass_idx.astype(jnp.uint32)
                        * np.uint32(spp)).reshape(lead + (1,))
                offset = pix[None] + poff
                dx = sampler.get(offset, 0)
                dy = sampler.get(offset, 1)
                cx = (jnp.asarray(x_cb, jnp.float32) + dx) * inv_w
                cy = 1.0 - (y_cb.astype(jnp.float32) + dy) * inv_h
                dirs = camera.ray_dirs(cx, cy, dtype).reshape(-1, 3)
                org = jnp.zeros_like(dirs)
                alive0 = jnp.broadcast_to(valid, offset.shape).reshape(-1)
                rad, segs = trace(scene, sampler, org, dirs,
                                  offset.reshape(-1), max_bounces,
                                  background, intersect_fn, select_mode,
                                  backend, alive0=alive0, mesh=mesh,
                                  mesh_consts=mesh_consts,
                                  origin_zero=True,
                                  block_lists0=block_lists)
                rad = rad.reshape(lead + (bt * txn * TILE * TILE, 3))
                if lead:
                    rad = jnp.sum(rad, axis=0)
                img = rad.reshape(bt, txn, TILE, TILE, 3)
                img = jnp.transpose(img, (0, 2, 1, 3, 4)) \
                    .reshape(bt * TILE, wp, 3)
                return img[:, :width], segs

            return band_pass_fn

        # Tile-culled bounce-0 mesh kernel (the PT analog of the PPM eye
        # pass's tile PVS, ops/pallas/tile_tri_kernel.py): cull the mesh
        # once on the host against each 32x32 tile's frustum (flip_y=True —
        # the path tracer's film map is cy = 1 - y/H) and swap the bounce-0
        # BVH walk for the listed Pallas kernel. PT tile-major lanes ARE
        # the kernel's block layout, so no lane permutation is needed.
        # PATHTRACER_PT_TILE_TRI=0 disables (walk everywhere), =1 forces it
        # on CPU in interpret mode (tests).
        tt_env = os.environ.get("PATHTRACER_PT_TILE_TRI", "")
        tt_static = None
        if (mesh is not None and backend != "xla" and tt_env != "0"
                and (tt_env == "1" or jax.default_backend() == "tpu")):
            tt_static = (tyn * txn, jax.default_backend() != "tpu")

        _tt_cache = []

        def tile_tri_arrays():
            """Lazy host cull: only callers that thread the result into
            tiled_pass_fn (make_render_fn) pay for the table build."""
            if tt_static is None:
                return None
            if not _tt_cache:
                from .ops.pallas import tile_tri_kernel as ttk
                bf = (getattr(mesh, "watertight", False)
                      and os.environ.get("PATHTRACER_TILE_BACKFACE",
                                         "1") != "0")
                tt = ttk.build_tile_tri_table(
                    camera, np.asarray(mesh.tri_a), np.asarray(mesh.tri_e1),
                    np.asarray(mesh.tri_e2), width, height, bvh=mesh,
                    backface_cull=bf, flip_y=True)
                bands, tt_tiles = ttk.band_chunk_maps(tt, hp)
                assert tt_tiles == tyn * txn, (tt_tiles, tyn, txn)
                _tt_cache.append((tt.table,) + tuple(bands[0]))
            return _tt_cache[0]

        def tiled_pass_fn(scene: SphereScene, pass_idx, row_ids=None,
                          mesh_consts=None, block_lists=None, raw=False,
                          tile_tri=None):
            """raw=True: return radiance in flat tile-major order (the trace
            layout) so a pass loop can accumulate across passes WITHOUT a
            per-pass untile transpose — callers untile the SUM once (see
            make_render_fn; tiled_pass_fn.untile)."""
            pass_idx = jnp.asarray(pass_idx)
            lead = pass_idx.shape
            poff = (pass_idx.astype(jnp.uint32) * np.uint32(spp)).reshape(
                lead + (1,))
            offset = jnp.asarray(pix_ord)[None] + poff  # (lead..., Np)
            dx = sampler.get(offset, 0)
            dy = sampler.get(offset, 1)
            cx = (jnp.asarray(x_c, jnp.float32) + dx) * inv_w
            cy = 1.0 - (jnp.asarray(y_c, jnp.float32) + dy) * inv_h
            dirs = camera.ray_dirs(cx, cy, dtype).reshape(-1, 3)
            org = jnp.zeros_like(dirs)
            alive0 = jnp.broadcast_to(jnp.asarray(valid_ord),
                                      offset.shape).reshape(-1)
            mi0 = None
            if tile_tri is not None and tt_static is not None and not lead:
                from .ops.pallas import tile_tri_kernel as ttk
                table_j, cs_j, ct_j, cf_j = tile_tri
                n_t, tt_interp = tt_static

                def mi0(org0, d0, alive_m):
                    # org0 unused: primaries all start at the origin and
                    # the per-tile culled lists replace the BVH walk
                    nr = n_t * ttk.BLOCK_ROWS
                    d_rows = jnp.concatenate(
                        [d0.T.reshape(3, nr, ttk.LANES),
                         jnp.zeros((3, ttk.BLOCK_ROWS, ttk.LANES),
                                   d0.dtype)], axis=1)
                    t_k, u_k, v_k, i_k = ttk.intersect_tile_tris_pallas(
                        table_j, cs_j, ct_j, cf_j, d_rows, n_t,
                        interpret=tt_interp)
                    cut = lambda o: o[:nr].reshape(-1)
                    t_k = cut(t_k)
                    return (t_k, cut(u_k), cut(v_k), cut(i_k),
                            (t_k < ttk.BIG) & alive_m)
            rad, segs = trace(scene, sampler, org, dirs, offset.reshape(-1),
                              max_bounces, background, intersect_fn,
                              select_mode, backend, alive0=alive0, mesh=mesh,
                              mesh_consts=mesh_consts, origin_zero=True,
                              block_lists0=block_lists, raw_planes=raw,
                              mesh_intersect0=mi0)
            if raw and rad.ndim == 3:
                # fused-kernel plane layout (3, lead*rows, 128): sum the
                # lead dim and hand the planes straight to the scan carry
                if lead:
                    rad = jnp.sum(
                        rad.reshape(3, lead[0], -1, rad.shape[-1]), axis=1)
                return rad, segs
            rad = rad.reshape(lead + (tyn * txn * TILE * TILE, 3))
            if lead:
                rad = jnp.sum(rad, axis=0)
            if raw:  # fallback backend returned (N, 3): convert to planes
                return rad.T.reshape(3, -1, 128), segs
            return untile(rad), segs

        def untile_planes(sums):
            """(3, rows, 128) scan-accumulated planes -> (H, W, 3)."""
            return untile(sums.reshape(3, -1).T)

        tiled_pass_fn.untile = untile_planes
        tiled_pass_fn.raw_shape = (3, tyn * txn * TILE * TILE // 128, 128)
        tiled_pass_fn.tile_tri_arrays = tile_tri_arrays
        return tiled_pass_fn

    def pass_fn(scene: SphereScene, pass_idx, row_ids=None,
                mesh_consts=None, block_lists=None):
        """pass_idx may be a scalar or a (pb,) vector of pass indices — a
        vector traces all those passes as one fused wavefront and returns
        their summed radiance (better TPU utilization at small images).
        block_lists is accepted for signature parity with the tiled pass
        and ignored (row-ordered blocks don't match the tile grid)."""
        if row_ids is None:
            row_ids = jnp.arange(height, dtype=jnp.int32)
        rows = row_ids.shape[0]
        pass_idx = jnp.asarray(pass_idx)
        lead = pass_idx.shape  # () or (pb,)
        # offset = y*W + x + pass*spp (integrator.ml:98)
        poff = (pass_idx.astype(jnp.uint32) * np.uint32(spp)).reshape(lead + (1, 1))
        offset = (row_ids[:, None].astype(jnp.uint32) * np.uint32(width)
                  + jnp.asarray(xs, jnp.uint32)[None, :]) + poff
        dx = sampler.get(offset, 0)
        dy = sampler.get(offset, 1)
        cx = (xf32[None, :] + dx) * inv_w
        cy = 1.0 - (row_ids[:, None].astype(jnp.float32) + dy) * inv_h
        dirs = camera.ray_dirs(cx, cy, dtype).reshape(-1, 3)
        org = jnp.zeros_like(dirs)
        rad, segs = trace(scene, sampler, org, dirs, offset.reshape(-1),
                          max_bounces, background, intersect_fn, select_mode,
                          backend, mesh=mesh, mesh_consts=mesh_consts,
                          origin_zero=True)
        rad = rad.reshape(lead + (rows, width, 3))
        if lead:
            rad = jnp.sum(rad, axis=0)
        return rad, segs

    if not dynamic_rows:
        return lambda scene, pass_idx, mesh_consts=None, block_lists=None: \
            pass_fn(scene, pass_idx, None, mesh_consts)
    return pass_fn


def default_passes_per_batch(width: int, height: int, spp: int,
                             target_rays: int = 1 << 19) -> int:
    """Batch passes so each fused wavefront has ~target_rays rays (bounded by
    HBM: the intersection working set is rays x spheres)."""
    pb = max(1, target_rays // max(1, width * height))
    while spp % pb:
        pb -= 1
    return pb


def make_render_fn(camera: Camera, background: Callable, width: int, height: int,
                   spp: int, max_bounces: int, dtype=jnp.float32,
                   filter_order: int = 5, filter_radius: int = 1,
                   intersect_fn=None, passes_per_batch: int | None = None,
                   select_mode: str = "gather", backend: str | None = None,
                   mesh=None, chains: int | None = None):
    """Build a jitted render(scene) -> (image (H,W,3), total segments).

    chains: number of INDEPENDENT pass pipelines per scan step. Two chains
    paid ~10% before the fused Pallas shade kernel by overlapping one
    chain's intersection with the other's XLA-side shading; with shading
    in-kernel there is little left to overlap and chains=1 measures ~1%
    faster (54.3 vs 53.9 Mrays/s across repeated runs), so 1 is the
    default. Vectorized pass batching (passes_per_batch > 1) fuses
    wavefronts instead, which loses to memory pressure (pb=2: 37 Mrays/s).
    """
    pass_fn = make_pass_fn(camera, background, width, height, spp, max_bounces,
                           dtype, intersect_fn, select_mode=select_mode,
                           backend=backend, mesh=mesh)
    kern2d = film.binomial_kernel_2d(filter_order, filter_radius)
    if passes_per_batch:
        pb = passes_per_batch
    else:
        try:  # tuning knobs must not break renders
            pb = int(os.environ.get("PATHTRACER_PB", "1"))
        except ValueError:
            pb = 1
    if pb < 1 or spp % pb != 0:
        pb = 1
    if chains is None:
        try:
            chains = int(os.environ.get("PATHTRACER_CHAINS") or 1)
        except ValueError:
            chains = 1
    if chains < 1 or (spp // pb) % chains != 0:
        chains = 2 if (spp // pb) % 2 == 0 else 1
    steps = spp // pb // chains

    # tiled pass_fns expose a raw (flat tile-major) output + an untile
    # closure: accumulate the film sum in that layout across the scan and
    # untile ONCE at the end instead of paying a per-pass transpose
    untile = getattr(pass_fn, "untile", None)

    @jax.jit
    def render_impl(scene: SphereScene, mesh_consts, block_lists, tile_tri):
        def body(sums, p_mat):
            total = sums
            segs = jnp.zeros((), jnp.int32)
            for k in range(chains):
                kw = {"raw": True} if untile is not None else {}
                if tile_tri is not None:
                    kw["tile_tri"] = tile_tri
                s, g = pass_fn(scene, p_mat[k] if pb > 1 else p_mat[k, 0],
                               mesh_consts=mesh_consts,
                               block_lists=block_lists, **kw)
                total = total + s
                segs = segs + g
            return total, segs

        init = (jnp.zeros(pass_fn.raw_shape, dtype) if untile is not None
                else jnp.zeros((height, width, 3), dtype))
        # Measured NEUTRAL on hardware (interleaved A/B at the canonical
        # config: unroll=1 146.6-147.6 ms vs unroll=2 145.9-146.9) — the
        # per-scan-step overhead is not where the ~3.5 ms/pass marginal
        # goes. Knob retained for re-testing on other devices.
        try:  # tuning knobs must not break renders
            unroll = int(os.environ.get("PATHTRACER_SCAN_UNROLL") or 1)
        except ValueError:
            unroll = 1
        if unroll < 1 or steps % unroll != 0:
            unroll = 1
        sums, segs = lax.scan(body, init,
                              jnp.arange(spp).reshape(steps, chains, pb),
                              unroll=unroll)
        if untile is not None:
            sums = untile(sums)
        img = film.finalize(film.apply_filter(sums, kern2d, dtype), spp)
        return img, jnp.sum(segs)

    # tiled + sphere-only scenes: per-tile frustum-culled sphere lists let
    # the bounce-0 intersection kernel loop over ~a handful of spheres per
    # 32x32 tile instead of the whole scene (bounce 0 is ~40% of segments)
    tiled_on = (backend != "xla" and jax.default_backend() == "tpu")
    cull_ok = (tiled_on and mesh is None and intersect_fn is None
               and (backend is None or str(backend).startswith("pallas2")))

    # mesh device arrays ride as jit ARGUMENTS (not closure constants,
    # which multiply XLA compile time — see MeshBVH.device_consts)
    consts = mesh.device_consts() if mesh is not None else None
    tt_dev = None
    tt_get = getattr(pass_fn, "tile_tri_arrays", None)
    tt_arrays = tt_get() if tt_get is not None else None
    if tt_arrays is not None:
        tt_dev = tuple(jnp.asarray(x) for x in tt_arrays)
        # force the bulk table upload to complete before first use (lazy
        # uploads through the TPU tunnel stall the first execution)
        jax.block_until_ready(tt_dev)

    def run(scene):
        bl = None
        if cull_ok and scene.tri_count == 0:
            lists, counts = tile_sphere_lists(
                camera, np.asarray(scene.center), np.asarray(scene.radius),
                np.asarray(scene.valid), width, height)
            bl = (jnp.asarray(lists), jnp.asarray(counts))
        return render_impl(scene, consts, bl, tt_dev)

    return run


def render_with_progress(camera, background, scene, width, height, spp,
                         max_bounces, dtype=jnp.float32, progress=None,
                         intersect_fn=None, filter_order=5, filter_radius=1,
                         backend=None):
    """Host-driven pass loop (enables the reference-style progress bar;
    render_command.ml:83-104). Returns (image np.ndarray, segments int)."""
    pass_fn = jax.jit(make_pass_fn(camera, background, width, height, spp,
                                   max_bounces, dtype, intersect_fn,
                                   backend=backend))
    kern2d = film.binomial_kernel_2d(filter_order, filter_radius)
    sums = jnp.zeros((height, width, 3), dtype)
    seg_acc = jnp.zeros((), jnp.int32)
    # progress updates are BATCHED: a per-pass host sync costs ~30 ms of
    # tunnel dispatch latency each (measured ~34 ms/pass at 600x300 -
    # more than the pass itself after warmup); syncing every 8 passes
    # keeps the bar honest at <=1/4-bar granularity (the reference
    # throttles redraws to >=0.2 s anyway, render_command.ml:85-104)
    # while the dispatch pipeline stays full between syncs. Segment
    # counts accumulate ON DEVICE - the old per-pass int(segs) pull was
    # the sync.
    batch = 8
    done = 0
    for p in range(spp):
        s, segs = pass_fn(scene, jnp.int32(p))
        sums = sums + s
        seg_acc = seg_acc + segs
        if (p + 1) % batch == 0 or p + 1 == spp:
            jax.block_until_ready(sums)
            if progress is not None:
                progress(width * height * (p + 1 - done))
                done = p + 1
    img = film.finalize(film.apply_filter(sums, kern2d, dtype), spp)
    return np.asarray(img), int(jax.device_get(seg_acc))

"""Pallas TPU kernel: the full per-bounce shading stage.

Companion to sphere_kernel: after the intersection kernel selects a winner
and XLA gathers its material columns, this kernel runs everything else —
stable-t recomputation, hit point/normal, spherical uv (polynomial
atan2/acos: Mosaic has no acos/atan lowering), checker/solid texture,
tangent-frame quaternion, the fixed-point LDS draws, the three-material
scatter, and the ray-state update — in registers, with whole-block early
exit for dead tiles. This removes the XLA-side per-bounce elementwise
pipeline and most of its HBM round-trips (the state arrays are read/written
exactly once per bounce here).

The gathered material payload is PACKED to 10 planes (7 f32 geometry +
3 uint32 with u15/u16 fixed-point albedo and the kind bits) instead of the
16 raw f32 shade_pack columns: the per-bounce pipeline is HBM-streaming
bound, and the gather's write+read round trip is the single largest stream
(16 planes = ~25 MB at the canonical config's full wavefront). u15 albedo
quantization error is 1.5e-5 — three orders under the 1e-3 RMSE budget.
ior_inv is recomputed in-kernel as 1/ior (one VPU divide) rather than
gathered.

Math is identical to integrator.trace's XLA path (itself mirroring
material.ml / shader_space.ml / sphere.ml); the approximations are the
polynomial atan (~1e-7 rad, feeds only texture uv) and the albedo
quantization above.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sphere_kernel import BIG, LANES, RAY_BLOCK

_PI = np.float32(np.pi)
_TWO_PI_INV = np.float32(0.5 / np.pi)
_PI_INV = np.float32(1.0 / np.pi)


def _atan_poly(z):
    """Minimax atan on |z| <= 1, max RELATIVE error 1.4e-7 (f32 Horner,
    validated against f64 over 2e6 points). Relative — not absolute —
    accuracy is what matters here: uv = atan2/2pi feeds checker-texture
    parity on the huge ground sphere, where the old poly's 2.3e-5
    relative error flipped ~0.04% of diffuse samples across a boundary
    and dominated the fused-path RMSE surcharge (1.39e-3 of the 1.48e-3
    at 160x80 spp=8, isolated by an exact-transcendental A/B)."""
    t = z * z
    p = np.float32(-0.0016994898)
    for c in (0.010494779, -0.030393856, 0.057162132, -0.083558545,
              0.10935136, -0.14260697, 0.19998156, -0.3333328, 1.0):
        p = p * t + np.float32(c)
    return z * p


def _atan2(y, x):
    """Full-quadrant atan2 from the atan polynomial."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    r = _atan_poly(num / jnp.maximum(den, np.float32(1e-30)))
    r = jnp.where(swap, np.float32(0.5 * np.pi) - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def _acos(x):
    """acos via atan2(sqrt(1-x^2), x). (1-x)*(1+x) instead of 1-x*x:
    both factors are exact near |x|=1 (Sterbenz), avoiding the
    cancellation that costs ~half the f32 digits at the poles."""
    s = jnp.sqrt(jnp.maximum((1.0 - x) * (1.0 + x), 0.0))
    return _atan2(s, x)


def _lds(offset_u32, hi, lo):
    """Fixed-point Roberts sequence draw (ops/lds.py sample_fixed),
    uint16-limb 64-bit product, top word -> [0,1)."""
    m = offset_u32 + jnp.uint32(1)
    mask16 = jnp.uint32(0xFFFF)
    p0 = lo & mask16
    p1 = lo >> 16
    q0 = m & mask16
    q1 = m >> 16
    pp0 = p0 * q0
    pp1a = p0 * q1
    pp1b = p1 * q0
    t1 = pp0 + (pp1a << 16)
    c1 = (t1 < pp0).astype(jnp.uint32)
    t2 = t1 + (pp1b << 16)
    c2 = (t2 < t1).astype(jnp.uint32)
    hi_w = hi * m + p1 * q1 + (pp1a >> 16) + (pp1b >> 16) + c1 + c2
    v = hi_w + jnp.uint32(0x80000000)
    # Mosaic can't cast uint32->f32; drop the lowest bit (below f32
    # resolution) and go via int32
    s = ((v >> 1).astype(jnp.int32).astype(jnp.float32)
         * np.float32(2.0 ** -31))
    return jnp.minimum(s, np.float32(1.0 - 2.0 ** -24))


PK_PLANES = 10  # 7 f32 geometry + 3 bit-packed (u32 bitcast to f32)
_Q15 = 32767.0
_Q16 = 65535.0


def pack_material_tables(shade_pack):
    """(S, 16) f32 shade_pack -> ONE (10, Sq, 128) f32 packed table,
    Sq = ceil(S/128), entry s at [:, s//128, s%128].

    The winner's columns are gathered IN-KERNEL from this VMEM-resident
    table by Mosaic lane shuffles (take_along_axis within each 128-wide
    slice + a select over slices) — an XLA-side gather costs ~0.4 ms/bounce
    of fixed op overhead on the v5e chip regardless of payload width, which
    was the single largest glue cost left in the bounce loop.

    Planes 0-6: cx, cy, cz, radius, ior, checker_w, checker_h — full f32
    (the stable-t recompute needs exact geometry; checker scales are
    integral in every committed scene and stay exact as f32).
    Planes 7-9 are uint32 words BITCAST to f32 (shuffles and selects move
    bits untouched, so NaN-aliasing patterns are safe):
          u0 = ca0_u15 | ca1_u15<<15 | mat_k<<30
          u1 = ca2_u15 | cb0_u15<<15 | tex_k<<30
          u2 = cb1_u16 | cb2_u16<<16
    Albedos are clamped to [0, 1] (the reference's textures are reflectance
    colors, texture.ml:20-31); u15 quantization error is <=1.5e-5."""
    pk = shade_pack

    def q(col, scale):
        return jnp.round(jnp.clip(pk[:, col], 0.0, 1.0)
                         * scale).astype(jnp.uint32)

    u0 = q(6, _Q15) | (q(7, _Q15) << 15) | (pk[:, 4].astype(jnp.uint32) << 30)
    u1 = q(8, _Q15) | (q(9, _Q15) << 15) | (pk[:, 5].astype(jnp.uint32) << 30)
    u2 = q(10, _Q16) | (q(11, _Q16) << 16)
    bc = lambda u: jax.lax.bitcast_convert_type(u, jnp.float32)
    tab = jnp.stack([pk[:, 0], pk[:, 1], pk[:, 2], pk[:, 3],
                     pk[:, 14], pk[:, 12], pk[:, 13],
                     bc(u0), bc(u1), bc(u2)])
    s = tab.shape[1]
    pad = (-s) % 128
    if pad:
        tab = jnp.concatenate([tab, jnp.zeros((PK_PLANES, pad), tab.dtype)],
                              axis=1)
    return tab.reshape(PK_PLANES, -1, 128)


def shade_body(limb_ref, bg_ref, tab_ref, st_ref, off_ref, idx, hit,
               rad_in_ref, out_st_ref, rad_ref, bg_mode):
    """The full shading stage on register inputs: `idx` (winner index) and
    `hit` (bool mask) are VPU registers, so the fused bounce kernel
    (fused_bounce_kernel.py) can feed them straight from its in-register
    intersection loop with no at/idx round trip through HBM. The
    shade-only kernel below derives them from its at/idx input refs."""
    o0, o1, o2 = st_ref[0], st_ref[1], st_ref[2]
    d0, d1, d2 = st_ref[3], st_ref[4], st_ref[5]
    a0, a1, a2 = st_ref[6], st_ref[7], st_ref[8]
    alive = st_ref[9] > 0.0
    a_q = d0 * d0 + d1 * d1 + d2 * d2
    inv_a = 1.0 / a_q

    # in-register winner gather: the (10, Sq, 128) packed table is
    # VMEM-resident; each lane pulls its winner's 10 values with a
    # lane shuffle per 128-wide slice + a select over slices. This
    # replaces the XLA pk gather between the kernels (~0.4 ms/bounce
    # of fixed op cost at any payload width).
    blk = idx.shape
    qi = jax.lax.shift_right_logical(idx, 7)
    r = idx & jnp.int32(127)
    n_sl = tab_ref.shape[1]
    pk = []
    for p in range(10):
        acc = jnp.zeros(blk, jnp.float32)
        for qslice in range(n_sl):
            row = jnp.broadcast_to(tab_ref[p, qslice, :][None, :], blk)
            g = jnp.take_along_axis(row, r, axis=1)
            acc = jnp.where(qi == qslice, g, acc) if n_sl > 1 else g
        pk.append(acc)

    cx, cy, cz, rad_s = pk[0], pk[1], pk[2], pk[3]
    ior, cw, ch = pk[4], pk[5], pk[6]
    ior_inv = 1.0 / jnp.maximum(ior, np.float32(1e-30))
    ubc = lambda p: jax.lax.bitcast_convert_type(p, jnp.uint32)
    u0, u1, u2 = ubc(pk[7]), ubc(pk[8]), ubc(pk[9])
    m15 = jnp.uint32(0x7FFF)
    c15 = np.float32(1.0 / _Q15)
    c16 = np.float32(1.0 / _Q16)

    def f15(u):  # low-15-bits fixed point -> f32 (Mosaic: via int32)
        return (u & m15).astype(jnp.int32).astype(jnp.float32) * c15

    ca0, ca1 = f15(u0), f15(u0 >> 15)
    ca2, cb0 = f15(u1), f15(u1 >> 15)
    cb1 = ((u2 & jnp.uint32(0xFFFF)).astype(jnp.int32)
           .astype(jnp.float32) * c16)
    cb2 = (u2 >> 16).astype(jnp.int32).astype(jnp.float32) * c16
    mat_u = u0 >> 30
    tex_u = u1 >> 30

    # stable t (sphere.ml:35-54) from the winner's params
    f0, f1, f2 = cx - o0, cy - o1, cz - o2
    bp = f0 * d0 + f1 * d1 + f2 * d2
    quad_f = f0 * f0 + f1 * f1 + f2 * f2
    r2 = rad_s * rad_s
    c_c = quad_f - r2
    disc = r2 - quad_f + bp * bp * inv_a
    sgn = jnp.where(bp >= 0.0, np.float32(1.0), np.float32(-1.0))
    qq = sgn * jnp.sqrt(jnp.maximum(a_q * disc, 0.0)) + bp
    t = jnp.where(c_c > 0.0, c_c / qq, qq * inv_a)

    # hit point + flipped normal
    p0, p1, p2 = o0 + t * d0, o1 + t * d1, o2 + t * d2
    n0, n1, n2 = p0 - cx, p1 - cy, p2 - cz
    ninv = jax.lax.rsqrt(jnp.maximum(n0 * n0 + n1 * n1 + n2 * n2,
                                     np.float32(1e-38)))
    n0, n1, n2 = n0 * ninv, n1 * ninv, n2 * ninv
    ddn = d0 * n0 + d1 * n1 + d2 * n2
    front = ddn < 0.0
    fs = jnp.where(front, np.float32(1.0), np.float32(-1.0))
    n0, n1, n2 = n0 * fs, n1 * fs, n2 * fs

    # spherical uv (sphere.ml:25-33)
    theta = _acos(jnp.clip(-n1, -1.0, 1.0))
    phi = _PI + _atan2(-n2, n0)
    u_t = phi * _TWO_PI_INV
    v_t = theta * _PI_INV
    # checker parity (texture.ml:20-31)
    pxp = jnp.trunc(u_t * cw).astype(jnp.int32) & 1
    pyp = jnp.trunc(v_t * ch).astype(jnp.int32) & 1
    even = pxp == pyp
    is_check = tex_u == jnp.uint32(1)
    alb0 = jnp.where(is_check & ~even, cb0, ca0)
    alb1 = jnp.where(is_check & ~even, cb1, ca1)
    alb2 = jnp.where(is_check & ~even, cb2, ca2)

    # tangent frame quaternion (shader_space.ml:11-23)
    eps = np.float32(1e-6)
    gw = 1.0 + n2
    gnorm = jax.lax.rsqrt(jnp.maximum(gw * gw + n1 * n1 + n0 * n0,
                                      np.float32(1e-38)))
    qw = gw * gnorm
    qx = n1 * gnorm
    qy = -n0 * gnorm
    # poles: z ~ +1 -> identity; z ~ -1 -> (0, (0,1,0))
    top = n2 > 1.0 - eps
    bot = n2 < eps - 1.0
    qw = jnp.where(top, 1.0, jnp.where(bot, 0.0, qw))
    qx = jnp.where(top | bot, 0.0, qx)
    qy = jnp.where(top, 0.0, jnp.where(bot, 1.0, qy))
    # qz = 0 always for this construction

    def rot(qw, qx, qy, v0, v1, v2, inv):
        # rotate v by quat (qw, qx, qy, 0); inv negates the vector part
        s = np.float32(-1.0) if inv else np.float32(1.0)
        rx, ry = qx * s, qy * s
        # t = 2 * cross(qv, v), qv = (rx, ry, 0)
        t0 = 2.0 * (ry * v2)
        t1 = 2.0 * (-rx * v2)
        t2 = 2.0 * (rx * v1 - ry * v0)
        # v + w*t + cross(qv, t)
        w0 = v0 + qw * t0 + (ry * t2)
        w1 = v1 + qw * t1 + (-rx * t2)
        w2 = v2 + qw * t2 + (rx * t1 - ry * t0)
        return w0, w1, w2

    wi0, wi1, wi2 = rot(qw, qx, qy, -d0, -d1, -d2, False)

    # LDS draws
    off = off_ref[:]
    u = _lds(off, limb_ref[0, 0], limb_ref[0, 1])
    v = _lds(off, limb_ref[1, 0], limb_ref[1, 1])

    # --- scatter (material.ml:22-57) ---
    # lambertian: cosine hemisphere
    rr = jnp.sqrt(u)
    th = v * np.float32(2.0 * np.pi)
    lam0 = rr * jnp.cos(th)
    lam1 = rr * jnp.sin(th)
    lam2 = jnp.sqrt(jnp.maximum(1.0 - u, 0.0))
    lam_ok = lam2 > 0.0
    # metal: mirror + tint
    met0, met1, met2 = -wi0, -wi1, wi2
    met_ok = met2 > 0.0
    s5 = (1.0 - wi2)
    s5 = s5 * s5 * s5 * s5 * s5
    tn0 = alb0 + (1.0 - alb0) * s5
    tn1 = alb1 + (1.0 - alb1) * s5
    tn2 = alb2 + (1.0 - alb2) * s5
    # dielectric
    ci = jnp.clip(wi2, 0.0, 1.0)
    si = jnp.sqrt(jnp.maximum(1.0 - ci * ci, 0.0))
    ratio = jnp.where(front, ior_inv, ior)
    r0s = (1.0 - ratio) / (1.0 + ratio)
    r0s = r0s * r0s
    omc = 1.0 - ci
    omc5 = omc * omc * omc * omc * omc
    schl = r0s + (1.0 - r0s) * omc5
    do_refl = (ratio * si > 1.0) | (schl > u)
    # refract (shader_space.ml:41-49)
    cc = jnp.minimum(wi2, 1.0)
    pe0 = ratio * (-wi0)
    pe1 = ratio * (-wi1)
    pe2 = ratio * (cc - wi2)
    para = -jnp.sqrt(jnp.abs(1.0 - (pe0 * pe0 + pe1 * pe1 + pe2 * pe2)))
    die0 = jnp.where(do_refl, met0, pe0)
    die1 = jnp.where(do_refl, met1, pe1)
    die2 = jnp.where(do_refl, met2, pe2 + para)

    is_met = mat_u == jnp.uint32(1)
    is_die = mat_u == jnp.uint32(2)
    wo0 = jnp.where(is_die, die0, jnp.where(is_met, met0, lam0))
    wo1 = jnp.where(is_die, die1, jnp.where(is_met, met1, lam1))
    wo2 = jnp.where(is_die, die2, jnp.where(is_met, met2, lam2))
    am0 = jnp.where(is_die, 1.0, jnp.where(is_met, tn0, alb0))
    am1 = jnp.where(is_die, 1.0, jnp.where(is_met, tn1, alb1))
    am2 = jnp.where(is_die, 1.0, jnp.where(is_met, tn2, alb2))
    ok = is_die | (is_met & met_ok) | (~is_die & ~is_met & lam_ok)

    # world ray (shader_space.ml:51-54)
    dw0, dw1, dw2 = rot(qw, qx, qy, wo0, wo1, wo2, True)
    shadow = np.float32(1e-3)
    no0 = p0 + shadow * dw0
    no1 = p1 + shadow * dw1
    no2 = p2 + shadow * dw2

    # miss: background radiance (rad += attn * bg)
    miss = alive & ~hit
    if bg_mode == 1:
        tt = 0.5 * (d1 + 1.0)
        b0 = bg_ref[0, 0] * (1.0 - tt) + bg_ref[1, 0] * tt
        b1 = bg_ref[0, 1] * (1.0 - tt) + bg_ref[1, 1] * tt
        b2 = bg_ref[0, 2] * (1.0 - tt) + bg_ref[1, 2] * tt
    else:
        b0 = jnp.full_like(d0, bg_ref[0, 0])
        b1 = jnp.full_like(d0, bg_ref[0, 1])
        b2 = jnp.full_like(d0, bg_ref[0, 2])
    zero = jnp.zeros_like(d0)
    rad_ref[0] = rad_in_ref[0] + jnp.where(miss, a0 * b0, zero)
    rad_ref[1] = rad_in_ref[1] + jnp.where(miss, a1 * b1, zero)
    rad_ref[2] = rad_in_ref[2] + jnp.where(miss, a2 * b2, zero)

    new_alive = hit & ok
    out_st_ref[0] = jnp.where(new_alive, no0, o0)
    out_st_ref[1] = jnp.where(new_alive, no1, o1)
    out_st_ref[2] = jnp.where(new_alive, no2, o2)
    out_st_ref[3] = jnp.where(new_alive, dw0, d0)
    out_st_ref[4] = jnp.where(new_alive, dw1, d1)
    out_st_ref[5] = jnp.where(new_alive, dw2, d2)
    out_st_ref[6] = jnp.where(new_alive, a0 * am0, a0)
    out_st_ref[7] = jnp.where(new_alive, a1 * am1, a1)
    out_st_ref[8] = jnp.where(new_alive, a2 * am2, a2)
    out_st_ref[9] = new_alive.astype(jnp.float32)


def _kernel(limb_ref, bg_ref, tab_ref, st_ref, idx_ref, off_ref, at_ref_in,
            rad_in_ref, out_st_ref, rad_ref, *, bg_mode):
    any_alive = jnp.max(st_ref[9]) > 0.0
    # default outputs: passthrough state and accumulated radiance (the
    # radiance accumulator rides THROUGH the kernel so dead blocks skip
    # the XLA-side add entirely)
    out_st_ref[...] = st_ref[...]
    rad_ref[...] = rad_in_ref[...]

    @pl.when(any_alive)
    def _run():
        alive = st_ref[9] > 0.0
        hit = (at_ref_in[:] < BIG) & alive
        shade_body(limb_ref, bg_ref, tab_ref, st_ref, off_ref, idx_ref[:],
                   hit, rad_in_ref, out_st_ref, rad_ref, bg_mode)



@functools.partial(jax.jit, static_argnames=("bg_mode", "interpret"))
def shade_pallas(state_rows, pack_table, idx_rows, off_rows, at_rows, limbs,
                 bg_colors, rad_in=None, bg_mode=1, interpret=False):
    """Run the shading stage for one bounce, all in (lead, rows, LANES)
    layout: state_rows (10,...) [org3, dir3, attn3, alive]; pack_table
    (10, Sq, 128) f32 packed material table (pack_material_tables) —
    whole-table VMEM resident, winner gather happens in-kernel; idx_rows
    (rows, LANES) int32 the intersection kernel's winner index; off_rows
    (rows, LANES) uint32 offsets; at_rows (rows, LANES) the intersection
    kernel's a*t key (BIG = miss); limbs: (2, 2) uint32
    [[u_hi, u_lo], [v_hi, v_lo]]; bg_colors: (2, 3);
    rad_in (3, rows, LANES): the radiance accumulator, updated in place
    (miss radiance is added IN-KERNEL so dead blocks skip the add).
    Returns (new_state (10, rows, LANES), rad (3, rows, LANES)).
    """
    _, rows, lanes = state_rows.shape
    assert lanes == LANES and (rows * LANES) % RAY_BLOCK == 0
    block_rows = RAY_BLOCK // LANES
    if rad_in is None:
        rad_in = jnp.zeros((3, rows, LANES), jnp.float32)

    def spec3(lead):
        return pl.BlockSpec((lead, block_rows, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    lane_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(pack_table.shape, lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_st, rad = pl.pallas_call(
        functools.partial(_kernel, bg_mode=bg_mode),
        grid=(rows // block_rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  tab_spec, spec3(10),
                  lane_spec, lane_spec, lane_spec, spec3(3)],
        out_specs=(spec3(10), spec3(3)),
        out_shape=(jax.ShapeDtypeStruct((10, rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((3, rows, LANES), jnp.float32)),
        # update state and the radiance accumulator in place
        input_output_aliases={3: 0, 7: 1},
        interpret=interpret,
    )(limbs, bg_colors, pack_table, state_rows, idx_rows, off_rows, at_rows,
      rad_in)
    return out_st, rad

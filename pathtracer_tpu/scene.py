"""Scene representation: structure-of-arrays geometry + materials.

The reference injects geometry as a closure `intersect : Ray.t -> Hit.t option`
and materials as closures inside `Hit.t` (`hit.ml:3-7`). Closures don't
vectorize; the TPU-native design is data: spheres are SoA arrays (the same
layout the reference's Rust AVX kernel uses for leaves —
`sphere-intersect-rs/src/lib.rs`), and materials are per-primitive codes +
parameter arrays dispatched with masks.

Material codes (material.ml:3-14): 0=Lambertian, 1=Metal, 2=Dielectric.
Texture codes (texture.ml:20-31): 0=solid (color_a), 1=checker (color_a even /
color_b odd, integer-parity of scaled uv).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

LAMBERTIAN = 0
METAL = 1
DIELECTRIC = 2

TEX_SOLID = 0
TEX_CHECKER = 1


class SphereScene(NamedTuple):
    """SoA sphere scene, already transformed to camera space."""

    center: jnp.ndarray  # (S, 3) f32
    radius: jnp.ndarray  # (S,) f32
    mat_kind: jnp.ndarray  # (S,) i32
    tex_kind: jnp.ndarray  # (S,) i32
    color_a: jnp.ndarray  # (S, 3) f32 — solid color / checker even color
    color_b: jnp.ndarray  # (S, 3) f32 — checker odd color
    checker_w: jnp.ndarray  # (S,) f32 — checker width-1 (texture.ml:22)
    checker_h: jnp.ndarray  # (S,) f32 — checker height-1
    ior: jnp.ndarray  # (S,) f32 — dielectric index
    ior_inv: jnp.ndarray  # (S,) f32
    valid: jnp.ndarray  # (S,) bool — False for padding entries
    shade_pack: jnp.ndarray  # (S, 16) f32 — all shading params, one gather/hit

    @property
    def count(self) -> int:
        return self.center.shape[0]


# shade_pack column layout
_PK_CENTER = slice(0, 3)
_PK_RADIUS = 3
_PK_MAT = 4
_PK_TEX = 5
_PK_CA = slice(6, 9)
_PK_CB = slice(9, 12)
_PK_CW = 12
_PK_CH = 13
_PK_IOR = 14
_PK_IOR_INV = 15


def shade_pack_columns(pk):
    """Unpack a gathered (N, 16) shading row into named columns."""
    return dict(
        center=pk[..., _PK_CENTER],
        mat_kind=pk[..., _PK_MAT],
        tex_kind=pk[..., _PK_TEX],
        color_a=pk[..., _PK_CA],
        color_b=pk[..., _PK_CB],
        checker_w=pk[..., _PK_CW],
        checker_h=pk[..., _PK_CH],
        ior=pk[..., _PK_IOR],
        ior_inv=pk[..., _PK_IOR_INV],
    )


class SceneBuilder:
    """Host-side accumulation of spheres; produces a padded SphereScene."""

    def __init__(self):
        self.rows = []

    def add_sphere(self, center, radius, mat_kind, color_a=(0, 0, 0),
                   color_b=(0, 0, 0), tex_kind=TEX_SOLID, checker_wh=(1, 1),
                   ior=1.5):
        self.rows.append(dict(
            center=np.asarray(center, np.float64), radius=float(radius),
            mat_kind=int(mat_kind), tex_kind=int(tex_kind),
            color_a=np.asarray(color_a, np.float64),
            color_b=np.asarray(color_b, np.float64),
            checker_wh=(float(checker_wh[0]), float(checker_wh[1])),
            ior=float(ior)))

    def build(self, camera=None, pad_to: int = 128, dtype=jnp.float32) -> SphereScene:
        n = len(self.rows)
        s = max(pad_to, -(-n // pad_to) * pad_to)
        center = np.zeros((s, 3), np.float64)
        radius = np.zeros(s, np.float64)
        mat_kind = np.zeros(s, np.int32)
        tex_kind = np.zeros(s, np.int32)
        color_a = np.zeros((s, 3), np.float64)
        color_b = np.zeros((s, 3), np.float64)
        checker_w = np.ones(s, np.float64)
        checker_h = np.ones(s, np.float64)
        ior = np.full(s, 1.5, np.float64)
        valid = np.zeros(s, bool)
        for i, r in enumerate(self.rows):
            center[i] = r["center"]
            radius[i] = r["radius"]
            mat_kind[i] = r["mat_kind"]
            tex_kind[i] = r["tex_kind"]
            color_a[i] = r["color_a"]
            color_b[i] = r["color_b"]
            # checker scales by (width-1, height-1) — texture.ml:21-22
            checker_w[i] = r["checker_wh"][0] - 1.0
            checker_h[i] = r["checker_wh"][1] - 1.0
            ior[i] = r["ior"]
            valid[i] = True
        if camera is not None:
            # scene-to-camera-space pre-transform (shirley_spheres/bin/main.ml:258-261)
            center[:n] = camera.transform_points(center[:n])
        pack = np.zeros((s, 16), np.float64)
        pack[:, 0:3] = center
        pack[:, 3] = radius
        pack[:, 4] = mat_kind
        pack[:, 5] = tex_kind
        pack[:, 6:9] = color_a
        pack[:, 9:12] = color_b
        pack[:, 12] = checker_w
        pack[:, 13] = checker_h
        pack[:, 14] = ior
        pack[:, 15] = 1.0 / ior
        return SphereScene(
            center=jnp.asarray(center, dtype),
            radius=jnp.asarray(radius, dtype),
            mat_kind=jnp.asarray(mat_kind),
            tex_kind=jnp.asarray(tex_kind),
            color_a=jnp.asarray(color_a, dtype),
            color_b=jnp.asarray(color_b, dtype),
            checker_w=jnp.asarray(checker_w, dtype),
            checker_h=jnp.asarray(checker_h, dtype),
            ior=jnp.asarray(ior, dtype),
            ior_inv=jnp.asarray(1.0 / ior, dtype),
            valid=jnp.asarray(valid),
            shade_pack=jnp.asarray(pack, dtype),
        )


def eval_texture(tex_kind, color_a, color_b, checker_w, checker_h, u, v):
    """Masked texture evaluation (texture.ml:20-31).

    checker parity: trunc(u * (width-1)) & 1 vs trunc(v * (height-1)) & 1.
    """
    px = jnp.trunc(u * checker_w).astype(jnp.int32) & 1
    py = jnp.trunc(v * checker_h).astype(jnp.int32) & 1
    checker = jnp.where((px == py)[..., None], color_a, color_b)
    return jnp.where((tex_kind == TEX_CHECKER)[..., None], checker, color_a)

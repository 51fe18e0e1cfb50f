"""Pinhole camera with scene-to-camera-space pre-transform.

Mirrors the reference's key architectural decision (`path_tracer/src/camera.ml`):
all scene geometry is transformed into camera space at build time via the
look-at matrix, so primary rays always start at the origin and ray generation
is a 2-mul-2-add per axis plus one normalize — no per-ray matrix multiply.

The look-at frame (camera.ml:16-31): z' = normalize(target-eye),
x' = normalize(z' x normalize(up)), y' = normalize(x' x z'); rows are
[x'|-eye.x'], [y'|-eye.y'], [-z'|eye.z'] — the camera looks down -Z.

Ray generation (camera.ml:85-102): given film coords (cx, cy) in [0,1]^2,
dir = normalize(lower_left + view * (cx, cy), -1), origin = 0.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .ops import vec


@dataclass(frozen=True)
class Camera:
    look_at: np.ndarray  # (3, 4) float64 world->camera affine transform
    lower_left_x: float
    lower_left_y: float
    view_x: float
    view_y: float

    @staticmethod
    def create(eye, target, up, aspect: float, vertical_fov_deg: float) -> "Camera":
        eye = np.asarray(eye, np.float64)
        target = np.asarray(target, np.float64)
        up = np.asarray(up, np.float64)

        def _norm(v):
            return v / math.hypot(v[0], math.hypot(v[1], v[2]))

        zp = _norm(target - eye)
        xp = _norm(np.cross(zp, _norm(up)))
        yp = _norm(np.cross(xp, zp))
        m = np.empty((3, 4), np.float64)
        m[0, :3] = xp
        m[0, 3] = -float(eye @ xp)
        m[1, :3] = yp
        m[1, 3] = -float(eye @ yp)
        m[2, :3] = -zp
        m[2, 3] = float(eye @ zp)

        half_h = math.tan(0.5 * math.radians(vertical_fov_deg))
        half_w = aspect * half_h
        return Camera(
            look_at=m,
            lower_left_x=-half_w,
            lower_left_y=-half_h,
            view_x=2.0 * half_w,
            view_y=2.0 * half_h,
        )

    def transform_points(self, pts: np.ndarray) -> np.ndarray:
        """Host-side (float64) world->camera transform of (N, 3) points."""
        pts = np.asarray(pts, np.float64)
        return pts @ self.look_at[:, :3].T + self.look_at[:, 3]

    def ray_dirs(self, cx, cy, dtype=jnp.float32):
        """Device-side primary ray directions from film coords in [0,1]^2.

        Returns unit directions (..., 3); origins are the camera-space origin.
        """
        cx = jnp.asarray(cx, dtype)
        cy = jnp.asarray(cy, dtype)
        d = vec.v3(
            jnp.asarray(self.lower_left_x, dtype) + jnp.asarray(self.view_x, dtype) * cx,
            jnp.asarray(self.lower_left_y, dtype) + jnp.asarray(self.view_y, dtype) * cy,
            jnp.full_like(cx, -1.0),
        )
        return vec.normalize(d)

"""Measure per-bounce lane/row/block occupancy of the bench wavefront.

Quantifies the gap between the current dead-block skip (1024-lane
granularity) and ideal lane compaction: how many Pallas blocks would the
sphere loop process per bounce under (a) status quo, (b) 128-lane row
compaction, (c) perfect lane compaction.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=1").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pathtracer_tpu.integrator import TILE, make_intersector
from pathtracer_tpu.models import shirley
from pathtracer_tpu.ops import quat as quat_ops
from pathtracer_tpu.ops import shading, vec
from pathtracer_tpu.ops.lds import Sampler

W, H, SPP, B = 600, 300, 32, 8
RAY_BLOCK, LANES = 1024, 128

scene, cam, background = shirley.build(W / H)
sampler = Sampler(2 + 2 * B)

hp = -(-H // TILE) * TILE
wp = -(-W // TILE) * TILE
tyn, txn = hp // TILE, wp // TILE
ty, tx, iy, ix = np.meshgrid(np.arange(tyn), np.arange(txn), np.arange(TILE),
                             np.arange(TILE), indexing="ij")
y_ord = (ty * TILE + iy).reshape(-1)
x_ord = (tx * TILE + ix).reshape(-1)
valid_ord = (y_ord < H) & (x_ord < W)
y_c = np.minimum(y_ord, H - 1)
x_c = np.minimum(x_ord, W - 1)
pix_ord = (y_c * W + x_c).astype(np.uint32)

hit_setup = jax.jit(make_intersector(scene, "xla"))


def bounce_masks(pass_idx):
    offset = jnp.asarray(pix_ord) + np.uint32(pass_idx * SPP)
    dx = sampler.get(offset, 0)
    dy = sampler.get(offset, 1)
    cx = (jnp.asarray(x_c, jnp.float32) + dx) / np.float32(W)
    cy = 1.0 - (jnp.asarray(y_c, jnp.float32) + dy) / np.float32(H)
    d = cam.ray_dirs(cx, cy, jnp.float32).reshape(-1, 3)
    org = jnp.zeros_like(d)
    alive = jnp.asarray(valid_ord)
    masks = []
    for bounce in range(B):
        masks.append(np.asarray(alive))
        h = hit_setup(org, d, alive)
        hit = h["hit"] & alive
        q = shading.shader_quat(h["normal"])
        omega_i = quat_ops.rotate(q, -d)
        u = sampler.get(offset, 2 + 2 * bounce)
        v = sampler.get(offset, 3 + 2 * bounce)
        wo, attn_mult, ok = shading.scatter(h["mat_kind"], h["albedo"],
                                            h["ior"], h["ior_inv"], omega_i,
                                            h["hit_front"], u, v)
        dir_world = quat_ops.rotate_inv(q, wo)
        new_org = shading.world_ray(h["point"], dir_world)
        alive = hit & ok
        org = vec.where3(alive, new_org, org)
        d = vec.where3(alive, dir_world, d)
    return masks


tot = {"blocks": 0, "live_blocks": 0, "live_rows": 0, "live_lanes": 0,
       "rows": 0, "lanes": 0}
per_bounce = []
for p in [0, 7, 15, 31]:
    masks = bounce_masks(p)
    for b, m in enumerate(masks):
        n = m.size
        blocks = m.reshape(-1, RAY_BLOCK)
        rows = m.reshape(-1, LANES)
        lb = int(blocks.any(1).sum())
        lr = int(rows.any(1).sum())
        ll = int(m.sum())
        if p == 0:
            per_bounce.append((b, ll / n, lr / (n // LANES),
                               lb / (n // RAY_BLOCK)))
        tot["blocks"] += n // RAY_BLOCK
        tot["live_blocks"] += lb
        tot["rows"] += n // LANES
        tot["live_rows"] += lr
        tot["lanes"] += n
        tot["live_lanes"] += ll

print("pass0 per-bounce (lane_frac, live_row_frac, live_block_frac):")
for b, lf, rf, bf in per_bounce:
    print(f"  b{b}: lanes={lf:.3f} rows={rf:.3f} blocks={bf:.3f}")
print(f"\naggregate over 4 passes x {B} bounces:")
print(f"  lane occupancy      = {tot['live_lanes']/tot['lanes']:.3f}")
print(f"  live-row fraction   = {tot['live_rows']/tot['rows']:.3f}")
print(f"  live-block fraction = {tot['live_blocks']/tot['blocks']:.3f}")
print(f"  speedup(block-skip -> row-compact)  = "
      f"{tot['live_blocks']/max(1,tot['live_rows']/8):.2f}x")
print(f"  speedup(block-skip -> lane-compact) = "
      f"{tot['live_blocks']/max(1,tot['live_lanes']/1024):.2f}x")

"""Attribute the shirley headline's per-pass fixed cost on hardware.

Fits wall(spp) at the canonical config for the per-pass marginal cost vs
the one-time tail (untile + film filter + finalize), times the filter
alone, and scales bounces to split the pass body. Informs NOTES' "~1.5
ms/pass beyond kernel sums" item.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.integrator import make_render_fn
from pathtracer_tpu.models import shirley
from pathtracer_tpu import film

W, H = 600, 300


def sync(x):
    # Pull ONE scalar, not a full image: a (H,W,3) device_get through the
    # tunnel costs ~150 ms and would swamp what we're measuring. The jit
    # program is a single executable, so any output syncs the whole call.
    leaf = jax.tree.leaves(x)[-1]
    if getattr(leaf, "ndim", 0):
        leaf = leaf.ravel()[0]
    float(np.asarray(jax.device_get(leaf)))


def best_wall(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    scene, cam, background = shirley.build(W / H)
    walls = {}
    for spp, b in ((8, 8), (16, 8), (32, 8), (32, 1), (32, 2), (32, 4)):
        render = make_render_fn(cam, background, W, H, spp, b)
        w = best_wall(render, scene)
        walls[(spp, b)] = w
        print(f"spp={spp} b={b}: {w*1e3:.1f} ms "
              f"({w/spp*1e3:.3f} ms/pass)", flush=True)
    # linear fit over spp at b=8
    xs = np.array([8, 16, 32], np.float64)
    ys = np.array([walls[(s, 8)] for s in (8, 16, 32)])
    slope, icept = np.polyfit(xs, ys, 1)
    print(f"fit: {slope*1e3:.3f} ms/pass marginal + {icept*1e3:.1f} ms fixed")

    # film filter + finalize alone (the fixed tail's main suspect)
    kern2d = film.binomial_kernel_2d(5, 1)

    @jax.jit
    def filt(sums):
        return film.finalize(film.apply_filter(sums, kern2d, jnp.float32), 32)

    sums = jnp.ones((H, W, 3), jnp.float32)
    print(f"filter+finalize: {best_wall(filt, sums)*1e3:.2f} ms")


if __name__ == "__main__":
    main()

"""Per-bounce attribution for the path-traced ganesha config.

Times one full-image tiled pass (600x600, tile-major, mesh composite
tier) at several max_bounces to get the marginal cost per bounce, and
pulls the alive-lane count after each bounce to size a compaction
ladder. Run on hardware: `python tools/profile_ganesha_pt.py [b ...]`.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from pathtracer_tpu.models import ganesha
from pathtracer_tpu.integrator import make_pass_fn
from pathtracer_tpu.ops.lds import Sampler


def main():
    w = h = 600
    spp = 8
    bounces_list = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8]
    scene, cam, bg, mesh = ganesha.build_pt("scenes/big_ganesha.ply", w / h)
    consts = mesh.device_consts()

    # warm the d2h channel first so timings below are attributable
    t0 = time.perf_counter()
    float(jnp.zeros(()))
    print(f"# d2h handshake: {time.perf_counter() - t0:.2f}s", flush=True)

    for b in bounces_list:
        pf = make_pass_fn(cam, bg, w, h, spp, b, backend="pallas",
                          mesh=mesh)
        f = jax.jit(lambda s, p, c: pf(s, p, mesh_consts=c))
        rad, segs = f(scene, jnp.uint32(0), consts)
        print(f"b={b} compile done segs={int(segs)}", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            rad, segs = f(scene, jnp.uint32(1), consts)
            s = int(segs)
            best = min(best, time.perf_counter() - t0)
        print(f"b={b} wall={best:.4f}s segs={s} "
              f"mrays={s / best / 1e6:.3f}", flush=True)

    # alive fraction per bounce: segments(b) - segments(b-1)
    # (already visible in the segs deltas above)


if __name__ == "__main__":
    main()

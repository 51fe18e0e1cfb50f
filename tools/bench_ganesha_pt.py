"""Path-traced ganesha throughput: the BVH8-walk wavefront measured in the
same Mrays/s units (segments traced / wall s) as the shirley headline.
Usage: python -m tools.bench_ganesha_pt [spp] [bounces] [width height]
"""
import sys
import time

import jax


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    h = int(sys.argv[4]) if len(sys.argv) > 4 else 600

    from pathtracer_tpu.integrator import make_render_fn
    from pathtracer_tpu.models import ganesha

    scene, cam, bg, mesh = ganesha.build_pt("scenes/big_ganesha.ply", w / h)
    render = make_render_fn(cam, bg, w, h, spp, bounces, mesh=mesh)

    t0 = time.perf_counter()
    img, segs = render(scene)
    segments = int(jax.device_get(segs))
    t_first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        img, segs = render(scene)
        segments = int(jax.device_get(segs))
        best = min(best, time.perf_counter() - t0)
    print(f"ganesha_pt {w}x{h} spp={spp} b={bounces}: "
          f"segments={segments} first={t_first:.2f}s best={best:.4f}s "
          f"{segments / best / 1e6:.2f} Mrays/s", flush=True)
    import numpy as np
    arr = np.asarray(img)
    print(f"image mean={arr.mean():.4f} max={arr.max():.4f}")
    if len(sys.argv) > 5:
        from pathtracer_tpu.io import png
        png.write(sys.argv[5], arr)


if __name__ == "__main__":
    main()

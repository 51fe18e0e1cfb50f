"""A/B the fused single-chip PPM iteration (one device program) against
the banded program chain: timing + bit-exactness, on hardware.
Usage: python -m tools.ab_ppm_fused [cornell|ganesha] [iters]
"""
import os
import sys
import time

import numpy as np


def run(which, iters, fuse):
    os.environ["PATHTRACER_PPM_FUSE"] = "1" if fuse else "0"
    import jax
    from pathtracer_tpu.ppm import PPMRenderer

    if which == "cornell":
        from pathtracer_tpu.models import cornell
        scene, cam, lights = cornell.build(1.0)
        mesh = bbox = None
    else:
        from pathtracer_tpu.models import ganesha
        scene, cam, lights, mesh, bbox = ganesha.build(
            "scenes/big_ganesha.ply", 1.0)
    times = []
    t_box = [None]

    def cb(i, img_sum):
        if img_sum is not None and not isinstance(img_sum, np.ndarray):
            jax.block_until_ready(img_sum)
        now = time.perf_counter()
        if t_box[0] is not None:
            times.append(now - t_box[0])
        t_box[0] = now

    r = PPMRenderer(scene=scene, camera=cam, lights=lights, width=600,
                    height=600, iterations=iters, photon_count=75000,
                    max_bounces=4, verbose=False, mesh=mesh,
                    bbox_override=bbox)
    cb(-1, None)
    img = r.render(checkpoint_cb=cb)
    return np.asarray(img, np.float64), times


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    img_f, t_f = run(which, iters, True)
    img_b, t_b = run(which, iters, False)
    print(f"{which} fused:  {[round(t, 3) for t in t_f]}")
    print(f"{which} banded: {[round(t, 3) for t in t_b]}")
    diff = np.abs(img_f - img_b)
    print(f"max abs diff = {diff.max():.3e}  bit-identical = "
          f"{bool((img_f == img_b).all())}")


if __name__ == "__main__":
    main()

"""High-quality-config benchmark: shirley 600x300 spp=512 bounces=16
(BASELINE.json's second config). Same honest d2h sync as bench.py.
Usage: python -m tools.bench_hq [spp] [bounces]
"""
import json
import sys
import time

import jax

from pathtracer_tpu.integrator import make_render_fn
from pathtracer_tpu.models import shirley


def main():
    width, height = 600, 300
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    scene, cam, background = shirley.build(width / height)
    render = make_render_fn(cam, background, width, height, spp, bounces)
    img, segs = render(scene)
    segments = int(jax.device_get(segs))

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        img, segs = render(scene)
        segments = int(jax.device_get(segs))
        best = min(best, time.perf_counter() - t0)
    mrays = segments / best / 1e6
    print(json.dumps({
        "metric": f"shirley_600x300_spp{spp}_b{bounces}_mrays_per_sec",
        "value": round(mrays, 2), "unit": "Mrays/s",
        "segments": segments, "best_wall_s": round(best, 3),
    }))


if __name__ == "__main__":
    main()

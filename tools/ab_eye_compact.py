"""A/B the PPM eye-walk lane-compaction ladder on hardware.

Runs the bench cornell/ganesha config (600x600, 75k photons, b=4,
3 iterations) with PATHTRACER_PPM_EYE_COMPACT=0 and =1 in separate
subprocesses (the knob is read at trace time; separate processes keep
the compile caches honest) and prints steady s/iter for each.
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import time, json, sys
import numpy as np
import jax
which = sys.argv[1]
from pathtracer_tpu.ppm import PPMRenderer
if which == "cornell":
    from pathtracer_tpu.models import cornell
    scene, cam, lights = cornell.build(1.0)
    mesh = None; bbox_override = None
else:
    from pathtracer_tpu.models import ganesha
    scene, cam, lights, mesh, bbox_override = ganesha.build(
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
                height=600, iterations=3, photon_count=75000,
                max_bounces=4, verbose=False, mesh=mesh,
                bbox_override=bbox_override)
cb(-1, None)
r.render(checkpoint_cb=cb)
steady = min(times[1:]) if len(times) > 1 else times[0]
print(json.dumps({"steady": steady, "times": [round(t, 3) for t in times]}))
"""


def run(which, compact):
    env = dict(os.environ)
    if compact == "auto":
        env.pop("PATHTRACER_PPM_EYE_COMPACT", None)
    else:
        env["PATHTRACER_PPM_EYE_COMPACT"] = compact
    out = subprocess.run(
        [sys.executable, "-c", CHILD, which], env=env, capture_output=True,
        text=True, timeout=900)
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        d = json.loads(line)
    except (json.JSONDecodeError, ValueError):
        print(f"{which} compact={compact}: FAILED\n{out.stdout}\n{out.stderr[-2000:]}")
        return None
    print(f"{which} compact={compact}: steady={d['steady']:.3f}s "
          f"times={d['times']}")
    return d["steady"]


if __name__ == "__main__":
    scenes = sys.argv[1:] or ["cornell", "ganesha"]
    modes = os.environ.get("AB_MODES", "0,1").split(",")
    for which in scenes:
        for compact in modes:
            run(which, compact)

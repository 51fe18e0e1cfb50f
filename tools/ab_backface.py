"""A/B the tile-list back-face cull on hardware: ganesha 600x600 75k b4.

Renders 3 iterations with PATHTRACER_TILE_BACKFACE=0 and =1 in separate
subprocesses; prints steady s/iter for each and whether the outputs are
bit-identical (expected: yes — the culled lists still contain every
possible nearest hit for the watertight shell, and the kernel's running
min never sees the dropped rows because they lose every comparison...
strictly, the dropped rows WERE compared before; bit-equality holds
because a back-facing row can only win if no front-facing hit exists at
smaller t, and for a closed shell that cannot happen for rays from
outside. Any mismatch prints the count of differing pixels.)
"""
import json
import os
import subprocess
import sys

CHILD = r"""
import time, json, sys
import numpy as np
import jax
from pathtracer_tpu.ppm import PPMRenderer
from pathtracer_tpu.models import ganesha
scene, cam, lights, mesh, bbox = ganesha.build("scenes/big_ganesha.ply", 1.0)
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
                bbox_override=bbox)
cb(-1, None)
img = r.render(checkpoint_cb=cb)
np.save(sys.argv[1], np.asarray(img))
steady = min(times[1:]) if len(times) > 1 else times[0]
print(json.dumps({"steady": steady, "times": [round(t, 3) for t in times]}))
"""

if __name__ == "__main__":
    import numpy as np
    outs = {}
    for mode in ("0", "1"):
        env = dict(os.environ, PATHTRACER_TILE_BACKFACE=mode)
        path = f"/tmp/ab_backface_{mode}.npy"
        r = subprocess.run([sys.executable, "-c", CHILD, path], env=env,
                           capture_output=True, text=True, timeout=900)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            d = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            print(f"backface={mode}: FAILED\n{r.stdout}\n{r.stderr[-2000:]}")
            sys.exit(1)
        print(f"backface={mode}: steady={d['steady']:.3f}s "
              f"times={d['times']}")
        outs[mode] = np.load(path)
    a, b = outs["0"], outs["1"]
    if np.array_equal(a, b):
        print("outputs BIT-IDENTICAL")
    else:
        diff = (a != b).any(axis=-1).sum()
        print(f"outputs differ at {diff} / {a.shape[0]*a.shape[1]} pixels; "
              f"max |d| = {np.abs(a.astype(np.float64)-b).max():.3e}")

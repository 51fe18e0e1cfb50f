"""On-hardware sweep of the ganesha PHOTON-pass walk knobs (chunk x caps).

The photon trace is ~60% of a ganesha PPM iteration after the adaptive
gather landed (0.195 s of 0.326 s/iter); its cost is the BVH8 re-entry walk
over incoherent photon rays. Each config runs in a fresh subprocess so the
PATHTRACER_WALK_* env knobs re-read cleanly.

Usage: python tools/sweep_photon_walk.py ["512|24,0;1024|24,0;..."]
Each config is chunk|caps or chunk|caps|key (key = dir/org/octorg,
PATHTRACER_WALK_KEY).
"""
import os
import subprocess
import sys

BODY = r"""
import time, os, jax, jax.numpy as jnp
from pathtracer_tpu import ppm as P
from pathtracer_tpu.models import ganesha
scene, cam, lights, mesh, bbox = ganesha.build('scenes/big_ganesha.ply', 1.0)
tp, total, dep = P.make_photon_pass(scene, lights, 75000, 4, 'pallas',
                                    mesh=mesh)
outs = tp(jnp.uint32(0))
jax.block_until_ready(outs[0])
best = 1e9
for rep in range(4):
    t0 = time.perf_counter()
    outs = tp(jnp.uint32(rep * 75000))
    float(jax.device_get(outs[0][0, 0]))  # honest d2h sync
    best = min(best, time.perf_counter() - t0)
print(f"chunk={os.environ.get('PATHTRACER_WALK_CHUNK')} "
      f"caps={os.environ.get('PATHTRACER_WALK_CAPS')} "
      f"key={os.environ.get('PATHTRACER_WALK_KEY', 'dir')}: "
      f"{best*1e3:.0f} ms/photon-pass", flush=True)
"""


def main():
    cfgs = (sys.argv[1] if len(sys.argv) > 1 else
            "512|24,0;512|48,0;512|0;1024|24,0;256|24,0;2048|24,0;"
            "512|16,32,0").split(";")
    for cfg in cfgs:
        parts = cfg.split("|")
        chunk, caps = parts[0], parts[1]
        env = dict(os.environ, PATHTRACER_WALK_CHUNK=chunk,
                   PATHTRACER_WALK_CAPS=caps)
        if len(parts) > 2:
            env["PATHTRACER_WALK_KEY"] = parts[2]
        r = subprocess.run([sys.executable, "-u", "-c", BODY], env=env,
                           capture_output=True, text=True, timeout=900)
        for line in (r.stdout + r.stderr).splitlines():
            if "chunk=" in line or "Error" in line:
                print(line, flush=True)


if __name__ == "__main__":
    main()

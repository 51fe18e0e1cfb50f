"""On-hardware sweep of the fused-path tuning knobs (compact schedule x
chains) at the canonical config. Each config runs in a fresh subprocess so
PATHTRACER_* env knobs re-read cleanly.

Usage: python tools/sweep_knobs.py [configs: "2,4|1;2,3|1;..."]
"""
import os
import subprocess
import sys

BODY = r"""
import time, jax
from pathtracer_tpu.integrator import make_render_fn
from pathtracer_tpu.models import shirley
W, H, SPP, B = 600, 300, 32, 8
scene, cam, bg = shirley.build(W / H)
render = make_render_fn(cam, bg, W, H, SPP, B)
img, segs = render(scene)
s0 = int(jax.device_get(segs))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    img, segs = render(scene)
    s0 = int(jax.device_get(segs))
    best = min(best, time.perf_counter() - t0)
import os
print(f"compact={os.environ.get('PATHTRACER_COMPACT_AT')} "
      f"chains={os.environ.get('PATHTRACER_CHAINS')}: "
      f"{best*1e3:.1f} ms, {s0/best/1e6:.2f} Mrays/s", flush=True)
"""


def main():
    cfgs = (sys.argv[1] if len(sys.argv) > 1
            else "2,4|1;2,4|2;2,3|1;2,5|1;2|1;3|1").split(";")
    for cfg in cfgs:
        ca, ch = cfg.split("|")
        env = dict(os.environ, PATHTRACER_COMPACT_AT=ca,
                   PATHTRACER_CHAINS=ch)
        r = subprocess.run([sys.executable, "-u", "-c", BODY], env=env,
                           capture_output=True, text=True, timeout=900)
        for line in (r.stdout + r.stderr).splitlines():
            if "compact=" in line or "Error" in line:
                print(line, flush=True)


if __name__ == "__main__":
    main()

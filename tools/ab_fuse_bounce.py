"""On-hardware A/B of the fused single-kernel bounce vs the two-kernel
pipeline (PATHTRACER_FUSE_BOUNCE=1 vs 0) at the canonical shirley config.
Fresh subprocess per arm so the env knob re-reads cleanly; arms also dump
the rendered image so bit-exactness is checked on hardware, not just in
interpret mode.

Usage: python tools/ab_fuse_bounce.py [spp] [bounces]
"""
import os
import subprocess
import sys

BODY = r"""
import os, time, sys
import numpy as np
import jax
from pathtracer_tpu.integrator import make_render_fn
from pathtracer_tpu.models import shirley
W, H = 600, 300
SPP, B = int(sys.argv[1]), int(sys.argv[2])
scene, cam, bg = shirley.build(W / H)
render = make_render_fn(cam, bg, W, H, SPP, B)
img, segs = render(scene)
s0 = int(jax.device_get(segs))
best = 1e9
for _ in range(4):
    t0 = time.perf_counter()
    img, segs = render(scene)
    s0 = int(jax.device_get(segs))
    best = min(best, time.perf_counter() - t0)
np.save(sys.argv[3], np.asarray(jax.device_get(img)))
print(f"fuse={os.environ.get('PATHTRACER_FUSE_BOUNCE')}: "
      f"{best*1e3:.1f} ms, {s0/best/1e6:.2f} Mrays/s", flush=True)
"""


def main():
    spp = sys.argv[1] if len(sys.argv) > 1 else "32"
    b = sys.argv[2] if len(sys.argv) > 2 else "8"
    outs = {}
    for fuse in ("0", "1"):
        env = dict(os.environ, PATHTRACER_FUSE_BOUNCE=fuse)
        out = f"/tmp/ab_fuse_{fuse}.npy"
        outs[fuse] = out
        r = subprocess.run([sys.executable, "-u", "-c", BODY, spp, b, out],
                           env=env, cwd=os.path.dirname(__file__) + "/..")
        if r.returncode != 0:
            print(f"fuse={fuse}: FAILED rc={r.returncode}")
            return 1
    import numpy as np
    a = np.load(outs["0"])
    c = np.load(outs["1"])
    print("bit-identical:" , bool((a == c).all()),
          "| max |diff|:", float(np.abs(a - c).max()))
    return 0


if __name__ == "__main__":
    sys.exit(main())

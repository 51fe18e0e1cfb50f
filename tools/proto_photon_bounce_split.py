"""Per-bounce cost split of the ganesha photon pass on hardware.

Times make_photon_pass at max_bounces=1..4 (fresh subprocess each so the
jit cache can't blend programs); successive deltas attribute the pass
time per bounce. Bounce 0 is the coherent spot-light cone (75k rays);
bounces 1-3 are RR-surviving diffuse scatters (~51k segments total at
75k photons), so if bounce 0 owns most of the wall the sectored
tri-list design (eye tile-cull analog over direction space) has a
large ceiling.
"""
import os
import subprocess
import sys

BODY = r"""
import time, jax, jax.numpy as jnp
from pathtracer_tpu import ppm as P
from pathtracer_tpu.models import ganesha
mb = int(__import__('os').environ['PROTO_MB'])
scene, cam, lights, mesh, bbox = ganesha.build('scenes/big_ganesha.ply', 1.0)
tp, total, dep = P.make_photon_pass(scene, lights, 75000, mb, 'pallas',
                                    mesh=mesh)
outs = tp(jnp.uint32(0))
jax.block_until_ready(outs[0])
best = 1e9
for rep in range(4):
    t0 = time.perf_counter()
    outs = tp(jnp.uint32(rep * 75000))
    float(jax.device_get(outs[0][0, 0]))
    best = min(best, time.perf_counter() - t0)
print(f"max_bounces={mb}: {best*1e3:.1f} ms", flush=True)
"""

for mb in (1, 2, 3, 4):
    env = dict(os.environ, PROTO_MB=str(mb))
    r = subprocess.run([sys.executable, "-u", "-c", BODY], env=env,
                       capture_output=True, text=True, timeout=900)
    for line in (r.stdout + r.stderr).splitlines():
        if "max_bounces=" in line or "Error" in line:
            print(line, flush=True)

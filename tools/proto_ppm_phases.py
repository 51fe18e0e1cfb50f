"""AOT phase timing for the photon pass: trace/lower, compile, execute as
separately observable steps (each printed as it completes, so a timeout
still reveals which phase stalls). Usage:
python -m tools.proto_ppm_phases [ply] [photon_count]
"""
import sys
import time

import jax
import jax.numpy as jnp

from pathtracer_tpu.models import ganesha
from pathtracer_tpu.ppm import make_photon_pass


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/big_ganesha.ply"
    n_photons = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    t0 = time.monotonic()
    scene, cam, lights, mesh, bbox = ganesha.build(path, 1.0)
    print(f"build {time.monotonic()-t0:.1f}s ({mesh.n_tris} tris)",
          flush=True)

    trace_photons, total, dep_rows = make_photon_pass(
        scene, lights, n_photons, 4, "pallas", mesh=mesh)
    tc = trace_photons._trace_chunk
    consts = mesh.device_consts()
    t0 = time.monotonic()
    jax.block_until_ready(consts)
    corner = float(consts["table"][0, 0])  # force real materialization
    print(f"consts ready: {time.monotonic()-t0:.1f}s", flush=True)

    t0 = time.monotonic()
    lowered = tc.lower(jnp.uint32(0), jnp.int32(0), consts, scene)
    print(f"lower: {time.monotonic()-t0:.1f}s", flush=True)
    t0 = time.monotonic()
    compiled = lowered.compile()
    print(f"compile: {time.monotonic()-t0:.1f}s", flush=True)
    t0 = time.monotonic()
    out = compiled(jnp.uint32(0), jnp.int32(0), consts, scene)
    jax.block_until_ready(out)
    print(f"exec1 (block_until_ready): {time.monotonic()-t0:.1f}s",
          flush=True)
    t0 = time.monotonic()
    n_dep = int(out[3].sum())  # REAL device->host pull; block_until_ready
    # intermittently returns early on the axon platform (BASELINE.md)
    print(f"pull1: {time.monotonic()-t0:.1f}s ({n_dep} deposits)",
          flush=True)
    t0 = time.monotonic()
    out = compiled(jnp.uint32(n_photons), jnp.int32(0), consts, scene)
    n_dep = int(out[3].sum())
    print(f"exec2+pull: {time.monotonic()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()

"""Split the photon-pass startup cost at real mesh scale: python trace,
XLA lower, XLA compile, first execution. Usage:
python -m tools.proto_ppm_compile [ply]"""
import sys
import time

import jax
import jax.numpy as jnp

from pathtracer_tpu.models import ganesha
from pathtracer_tpu.ppm import make_photon_pass


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/big_ganesha.ply"
    n_photons = int(sys.argv[2]) if len(sys.argv) > 2 else 75000
    t0 = time.monotonic()
    scene, cam, lights, mesh, bbox = ganesha.build(path, 1.0)
    print(f"build {time.monotonic()-t0:.1f}s ({mesh.n_tris} tris)",
          flush=True)

    # make_photon_pass returns a closure over jit(trace_chunk); rebuild the
    # same jit here via its public surface: call once and time phases with
    # jax.profiler-free wall clocks around lower/compile.
    trace_photons, total, dep_rows = make_photon_pass(
        scene, lights, n_photons, 4, "pallas", mesh=mesh)

    t0 = time.monotonic()
    out = trace_photons(jnp.uint32(0))
    jax.block_until_ready(out)
    print(f"first call (trace+compile+exec): {time.monotonic()-t0:.1f}s",
          flush=True)
    t0 = time.monotonic()
    out = trace_photons(jnp.uint32(n_photons))
    jax.block_until_ready(out)
    print(f"steady call: {time.monotonic()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()

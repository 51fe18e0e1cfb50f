"""How does photon-pass lowering time scale with max_bounces, and what is
the lowered module's size? Uses the small stand-in mesh for speed. Usage:
JAX_PLATFORMS=cpu python -m tools.proto_lower_scaling [ply]
"""
import sys
import time

import jax
import jax.numpy as jnp


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/big_ganesha.ply"
    from pathtracer_tpu.models import ganesha
    from pathtracer_tpu import ppm as ppm_mod
    from pathtracer_tpu.ppm import make_photon_pass

    scene, cam, lights, mesh, bbox = ganesha.build(path, 1.0)
    print(f"{mesh.n_tris} tris", flush=True)

    for backend in ("pallas", "xla"):
        for b in (1, 2, 4):
            trace_photons, total, dep_rows = make_photon_pass(
                scene, lights, 75000, b, backend, mesh=mesh)
            t0 = time.monotonic()
            out = trace_photons(jnp.uint32(0))
            jax.block_until_ready(out)
            wall = time.monotonic() - t0
            print(f"backend={backend} b={b}: first={wall:.1f}s", flush=True)


if __name__ == "__main__":
    main()

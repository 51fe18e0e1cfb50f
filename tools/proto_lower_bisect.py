"""Bisect the photon-pass jaxpr->MLIR lowering blowup at real mesh scale.

Runs make_photon_pass variants on the CPU backend with jax_log_compiles on
and reports trace / lower / compile / exec per variant. Usage:
JAX_PLATFORMS=cpu python -m tools.proto_lower_bisect [ply]
"""
import logging
import re
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_log_compiles", True)


class PhaseGrab(logging.Handler):
    def __init__(self):
        super().__init__()
        self.phases = {}

    def emit(self, record):
        msg = record.getMessage()
        m = re.search(r"Finished (tracing \+ transforming|jaxpr to MLIR"
                      r" module conversion|XLA compilation of)"
                      r" .*trace_chunk.* in ([0-9.]+) sec", msg)
        if m:
            self.phases[m.group(1).split()[0]] = float(m.group(2))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/big_ganesha.ply"
    from pathtracer_tpu.models import ganesha
    from pathtracer_tpu.ppm import make_photon_pass

    t0 = time.monotonic()
    scene, cam, lights, mesh, bbox = ganesha.build(path, 1.0)
    print(f"build {time.monotonic()-t0:.1f}s ({mesh.n_tris} tris)",
          flush=True)

    grab = PhaseGrab()
    logging.getLogger("jax._src.dispatch").addHandler(grab)
    logging.getLogger("jax._src.interpreters.pxla").addHandler(grab)

    variants = [
        ("bounces=4 pallas", dict(max_bounces=4, backend="pallas")),
    ]
    for name, kw in variants:
        grab.phases.clear()
        trace_photons, total, dep_rows = make_photon_pass(
            scene, lights, 75000, kw["max_bounces"], kw["backend"],
            mesh=mesh)
        t0 = time.monotonic()
        out = trace_photons(jnp.uint32(0))
        jax.block_until_ready(out)
        wall = time.monotonic() - t0
        print(f"{name}: first={wall:.1f}s phases={grab.phases}", flush=True)


if __name__ == "__main__":
    main()

"""Attribute a steady-state PPM iteration's wall time to phases ON REAL
HARDWARE via PPMRenderer.phase_cb (the production loop, not a replica).
Two passes:

  sync  — block_until_ready at every phase boundary: true per-phase
          device cost (sum > pipelined wall because overlap is disabled)
  async — timestamps only (production behavior): shows how much the
          dispatch pipeline hides; 'bands_dispatched' ≈ host dispatch
          cost, 'stitch' ≈ device execution the host then waits on

Usage: python -m tools.proto_ppm_iter_phases [scene] [iters]
        scene = ganesha (default; scenes/big_ganesha.ply) | cornell
"""
import sys
import time

import jax

if "--cpu" in sys.argv:  # smoke-test mode (hardware probe otherwise)
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")


def run(which, iters, sync):
    from pathtracer_tpu.ppm import PPMRenderer

    if which == "cornell":
        from pathtracer_tpu.models import cornell
        scene, cam, lights = cornell.build(1.0)
        mesh = bbox = None
    else:
        from pathtracer_tpu.models import ganesha
        scene, cam, lights, mesh, bbox = ganesha.build(
            "scenes/big_ganesha.ply", 1.0)

    state = {"t": None, "iter": 0}

    def cb(name, value):
        now = time.monotonic()
        if sync and value is not None:
            jax.block_until_ready(value)
            now_s = time.monotonic()
        else:
            now_s = now
        if state["t"] is not None:
            print(f"    {name}: +{now - state['t']:.3f}s"
                  + (f" (sync {now_s - now:.3f}s)" if sync else ""),
                  flush=True)
        state["t"] = now_s
        if name == "stitch":
            state["iter"] += 1
            print(f"  -- iteration {state['iter']} done", flush=True)
            state["t"] = time.monotonic()  # start of the next iteration

    r = PPMRenderer(scene=scene, camera=cam, lights=lights, width=600,
                    height=600, iterations=iters, photon_count=75000,
                    max_bounces=4, verbose=False, mesh=mesh,
                    bbox_override=bbox, phase_cb=cb,
                    devices=jax.devices()[:1])
    t0 = time.monotonic()
    state["t"] = t0
    r.render()
    print(f"[{'sync' if sync else 'async'}] total {iters} iters: "
          f"{time.monotonic() - t0:.2f}s (iter0 includes compiles)",
          flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ganesha"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    run(which, iters, sync=True)
    run(which, iters, sync=False)


if __name__ == "__main__":
    main()

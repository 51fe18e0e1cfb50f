"""Split one cornell PPM iteration into phases: photon trace, grid build,
per-band eye pass (walk vs gather), with a jax.profiler trace over one
band. Mirrors PPMRenderer.render's kernel-path branch.
Usage: python -m tools.proto_eye_profile
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.models import cornell
from pathtracer_tpu import ppm as P


def main():
    t0 = time.monotonic()
    float((jnp.arange(8.0) + 1.0)[0])  # warm the tunnel's d2h path
    print(f"device warmup: {time.monotonic()-t0:.1f}s", flush=True)
    W = H = 600
    scene, camera, lights = cornell.build(W / H)[:3]
    r = 0.035
    trace_photons, total, dep_lanes = P.make_photon_pass(
        scene, lights, 75000, 4, "pallas")
    t0 = time.monotonic()
    pos, nrm, flux, ok = trace_photons(jnp.uint32(0))
    n_ph = int(ok.sum())
    print(f"photon pass: {time.monotonic()-t0:.2f}s ({n_ph})", flush=True)

    from pathtracer_tpu.ops.pallas import gather_kernel as gk
    big = np.float32(3.0e38)
    t0 = time.monotonic()
    glo = np.asarray(jnp.min(jnp.where(ok[:, None], pos, big), axis=0),
                     np.float64) - 1e-5
    ghi = np.asarray(jnp.max(jnp.where(ok[:, None], pos, -big), axis=0),
                     np.float64)
    extent = float(max(1e-9, (ghi - glo).max()))
    cell = np.float32(max(r, extent / (gk.SIDE - 1)))
    photons_t, start, count = gk.build_photon_grid_morton(
        pos, nrm, flux, ok, jnp.asarray(np.asarray(glo, np.float32)), cell)
    grid = (photons_t, start, count,
            jnp.asarray(np.asarray(glo, np.float32)), cell)
    jax.block_until_ready(photons_t)
    print(f"grid build: {time.monotonic()-t0:.2f}s", flush=True)

    band_rows = 64
    eye_fn = jax.jit(P.make_eye_pass(camera, W, H, 4, 75000,
                                     dep_lanes, "pallas",
                                     band_rows=band_rows, use_kernel=True))
    # compile once
    b = eye_fn(jnp.uint32(0), jnp.float32(r), grid, jnp.int32(0), None,
               scene)
    np.asarray(b)
    print("eye compile done", flush=True)
    n_bands = -(-H // band_rows)
    t0 = time.monotonic()
    for bi in range(n_bands):
        b = eye_fn(jnp.uint32(0), jnp.float32(r), grid,
                   jnp.int32(bi * band_rows), None, scene)
    np.asarray(b)
    dt = time.monotonic() - t0
    print(f"eye pass: {dt:.2f}s total, {dt/n_bands*1000:.0f} ms/band "
          f"x{n_bands}", flush=True)

    jax.profiler.start_trace("/tmp/eyetrace")
    b = eye_fn(jnp.uint32(0), jnp.float32(r), grid, jnp.int32(256), None,
               scene)
    np.asarray(b)
    jax.profiler.stop_trace()
    print("trace at /tmp/eyetrace", flush=True)


if __name__ == "__main__":
    main()

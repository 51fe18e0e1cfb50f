"""Split the fused cornell iteration's wall time into its three phases by
timing partial programs (trace+build alone, eye walk alone, gather+finish
alone), each as its own jit, steady-state. Hardware attribution for the
round-5 'cornell <= 0.055 s/iter' push.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from pathtracer_tpu.models import cornell
from pathtracer_tpu.ppm import (PPMRenderer, make_photon_pass, make_eye_pass,
                                grid_m_for, scene_all_diffuse)
from pathtracer_tpu.ops.pallas import gather_kernel as gk


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    scene, cam, lights = cornell.build(1.0)
    W = H = 600
    pc, mb = 75000, 4
    rend = PPMRenderer(scene, cam, lights, W, H, iterations=1,
                       photon_count=pc, max_bounces=mb, verbose=False)
    r = rend.radius(1)
    trace_photons, total, dep_lanes = make_photon_pass(
        scene, lights, pc, mb, "pallas", devices=jax.devices())
    grid_m = grid_m_for(pc, 1)
    eff_b = 1 if scene_all_diffuse(scene) else mb

    @jax.jit
    def trace_build(off, consts, scene_t):
        out = trace_photons.body(off, jnp.int32(0), consts, scene_t)
        dep = trace_photons.flatten(out)
        return gk.build_photon_chunks(*dep)

    t_tb, grid = timeit(trace_build, jnp.uint32(0), None, scene)
    print(f"trace+build: {t_tb*1e3:.1f} ms")

    @jax.jit
    def trace_only(off, consts, scene_t):
        out = trace_photons.body(off, jnp.int32(0), consts, scene_t)
        return trace_photons.flatten(out)

    t_tr, dep = timeit(trace_only, jnp.uint32(0), None, scene)
    print(f"trace only:  {t_tr*1e3:.1f} ms  -> build ~{(t_tb-t_tr)*1e3:.1f} ms")

    eye = make_eye_pass(cam, W, H, mb, pc, dep_lanes, "pallas",
                        grid_m=grid_m, band_rows=H, use_kernel=True,
                        eff_bounces=eff_b)
    walk_j = jax.jit(eye.walk)
    t_w, fd = timeit(walk_j, jnp.uint32(0), jnp.int32(0), None, scene)
    print(f"eye walk:    {t_w*1e3:.1f} ms")

    gather_j = jax.jit(eye.make_gather(0))
    t_g, flux = timeit(gather_j, fd[0], fd[1], fd[3], jnp.float32(r), grid)
    print(f"gather:      {t_g*1e3:.1f} ms")

    finish_j = jax.jit(eye.finish)
    t_f, band = timeit(finish_j, fd[2], fd[3], flux, jnp.float32(r))
    print(f"finish:      {t_f*1e3:.1f} ms")

    @jax.jit
    def whole(off_ph, off_eye, rj, consts, scene_t):
        out = trace_photons.body(off_ph, jnp.int32(0), consts, scene_t)
        dep = jax.lax.optimization_barrier(trace_photons.flatten(out))
        grid = jax.lax.optimization_barrier(gk.build_photon_chunks(*dep))
        return eye(off_eye, rj, grid, jnp.int32(0), consts, scene_t)

    t_all, _ = timeit(whole, jnp.uint32(0), jnp.uint32(0), jnp.float32(r),
                      None, scene)
    print(f"fused whole: {t_all*1e3:.1f} ms "
          f"(phase sum {(t_tb+t_w+t_g+t_f)*1e3:.1f} ms)")


if __name__ == "__main__":
    main()

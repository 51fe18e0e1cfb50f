#!/usr/bin/env python
"""Canonical benchmarks on the default JAX platform (TPU when present).

Prints one JSON line per scene {"metric", "value", "unit", "vs_baseline"}:
1. shirley-spheres 600x300 spp=32 bounces=8 (the reference README's
   command): Mrays/s (ray segments actually traced / wall seconds, the
   bounce-loop-iterations counting of BASELINE.md). vs_baseline = ratio
   vs the driver-set north-star of 500 Mrays/s on a v5e-8 (the reference
   publishes no numbers — BASELINE.md), scaled by chip count so a
   single-chip run is compared against its 1/8 share. THIS LINE IS THE
   HEADLINE METRIC and always prints first.
2. cornell-box 600x600 75k photons b=4: steady-state seconds/iteration
   (the reference prints per-iteration telemetry, ppm.ml:434-445).
   vs_baseline = round-2 steady state (1.33 s) / value, so >1 = faster
   than the round-2 build.
3. ganesha (committed 449k-tri shell) 600x600 75k photons b=4: same
   convention; round-2 steady state 1.90 s/iter.

Scenes 2-3 are skipped (with a comment line) if their setup fails, so a
PPM regression can never hide the headline metric.
"""

import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp


def _wait_for_device(attempts=3, probe_timeout=90, retry_sleep=20):
    """Device-availability watchdog: jax backend init through the TPU
    tunnel HANGS (not errors) while the tunnel is down, and the first
    jax.devices() in THIS process is uninterruptible — so probe in a
    killable subprocess and only proceed once a probe succeeds.

    Geometry matters: the round-3 capture was lost because 8 probes x
    (180 s + 60 s) ~= 32 min of silent waiting exceeded the driver's
    patience (rc=124, no output). A dead tunnel must instead fail FAST
    (<6 min worst case) and LOUD: emit one parseable JSON line with an
    "error" field on stdout so the captured artifact is never empty."""
    for attempt in range(attempts):
        try:
            p = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True)
            if p.returncode == 0:
                return
            msg = f"probe exited {p.returncode}"
        except subprocess.TimeoutExpired:
            msg = f"probe hung >{probe_timeout}s (tunnel down?)"
        print(f"# device probe {attempt + 1}/{attempts}: {msg}",
              file=sys.stderr)
        if attempt + 1 < attempts:
            time.sleep(retry_sleep)
    print(json.dumps({
        "metric": "shirley_600x300_spp32_b8_mrays_per_sec",
        "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
        "error": "no usable jax device (TPU tunnel down); bench aborted",
    }))
    sys.exit(1)


def main():
    # Hard wall: if the tunnel dies MID-run, device calls hang rather
    # than error. Bound the whole bench so the driver always gets a
    # parseable line for every phase that did not complete in time.
    import signal

    def _on_alarm(signum, frame):
        print(json.dumps({
            "metric": "bench_wall_watchdog", "value": 0.0, "unit": "s",
            "vs_baseline": 0.0,
            "error": "bench exceeded wall budget (tunnel hang mid-run?)",
        }))
        sys.stdout.flush()
        import os
        os._exit(1)

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(2400)  # cold-cache compiles alone are ~7 min/PPM scene
    _wait_for_device()
    for attempt in range(3):
        try:
            _run()
            break
        except Exception as e:  # the tunneled TPU can wedge after a killed run
            if attempt == 2:
                raise
            print(f"# attempt {attempt} failed ({type(e).__name__}); "
                  f"waiting for the TPU to recover", file=sys.stderr)
            time.sleep(45)
    for scene in ("cornell", "ganesha"):
        try:
            _run_ppm(scene)
        except Exception as e:
            print(f"# {scene} bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)


def _run_ppm(which: str):
    """Steady-state PPM seconds/iteration: run 3 iterations, report the
    fastest post-compile iteration (compiles land in iteration 0)."""
    import numpy as np
    from pathtracer_tpu.ppm import PPMRenderer

    if which == "cornell":
        from pathtracer_tpu.models import cornell
        scene, cam, lights = cornell.build(1.0)
        mesh = None
        bbox_override = None
        baseline = 1.33
    else:
        from pathtracer_tpu.models import ganesha
        scene, cam, lights, mesh, bbox_override = ganesha.build(
            "scenes/big_ganesha.ply", 1.0)
        baseline = 1.90
    times = []
    t_box = [None]

    def cb(i, img_sum):
        # with device-side film accumulation img_sum is a device array and
        # the host loop runs ahead of the device — sync so each recorded
        # iteration time reflects actual device completion
        if img_sum is not None and not isinstance(img_sum, np.ndarray):
            jax.block_until_ready(img_sum)
        now = time.perf_counter()
        if t_box[0] is not None:
            times.append(now - t_box[0])
        t_box[0] = now

    r = PPMRenderer(scene=scene, camera=cam, lights=lights, width=600,
                    height=600, iterations=3, photon_count=75000,
                    max_bounces=4, verbose=False, mesh=mesh,
                    bbox_override=bbox_override)
    t_box[0] = None
    t0 = time.perf_counter()
    cb(-1, None)
    r.render(checkpoint_cb=cb)
    total = time.perf_counter() - t0
    steady = min(times[1:]) if len(times) > 1 else times[0]
    result = {
        "metric": f"{which}_600x600_75k_b4_sec_per_iter",
        "value": round(steady, 3),
        "unit": "s/iter",
        "vs_baseline": round(baseline / steady, 4),
    }
    print(json.dumps(result))
    print(f"# {which}: iters={len(times)} times="
          f"{[round(t, 2) for t in times]} total={total:.1f}s",
          file=sys.stderr)
    if which == "ganesha" and getattr(r, "iter_segments", None):
        # north-star accounting (BASELINE.md): a gather-bound PPM scene's
        # throughput in the same Mrays/s units as the headline — segments
        # actually traced (photon bounce-loop iterations + one primary/pixel
        # for the all-diffuse mesh) per steady-iteration second. vs_baseline
        # uses the same 62.5 Mrays/s-per-chip share as the headline so the
        # structural gap of photon-map gathers is stated, not hidden.
        ph, eye = r.iter_segments[-1]
        if ph is not None and eye is not None:
            segs = sum(int(jax.device_get(s)) for s in ph) + eye
            mrays = segs / steady / 1e6
            n_chips = len(jax.devices())
            print(json.dumps({
                "metric": "ganesha_600x600_75k_b4_mrays_per_sec",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / (62.5 * n_chips), 4),
            }))
            print(f"# ganesha segments/iter: photon={segs - eye} eye={eye}",
                  file=sys.stderr)


def _run():
    width, height, spp, bounces = 600, 300, 32, 8
    repeats = 3

    from pathtracer_tpu.integrator import make_render_fn
    from pathtracer_tpu.models import shirley

    scene, cam, background = shirley.build(width / height)
    n_dev = len(jax.devices())
    if n_dev > 1 and spp % n_dev == 0:
        # multi-chip: shard passes over the device mesh, psum the film
        from pathtracer_tpu.parallel.mesh import (make_mesh,
                                                  make_sharded_render_fn)
        mesh = make_mesh(dp=n_dev, sp=1)
        render = make_sharded_render_fn(cam, background, width, height, spp,
                                        bounces, mesh)
    else:
        render = make_render_fn(cam, background, width, height, spp, bounces)

    # warmup / compile. Timing syncs with a real device->host scalar pull:
    # block_until_ready intermittently returns early on the tunneled axon
    # platform (it once reported a 0.0000s render), while a d2h read can
    # only complete after the program actually ran.
    img, segs = render(scene)
    segments = int(jax.device_get(segs))

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        img, segs = render(scene)
        segments = int(jax.device_get(segs))
        best = min(best, time.perf_counter() - t0)
    mrays = segments / best / 1e6
    n_chips = len(jax.devices())
    target_per_chip = 500.0 / 8.0  # north star is 500 Mrays/s on 8 chips
    result = {
        "metric": "shirley_600x300_spp32_b8_mrays_per_sec",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / (target_per_chip * n_chips), 4),
    }
    print(json.dumps(result))
    print(f"# platform={jax.devices()[0].platform} chips={n_chips} "
          f"segments={segments} best_wall={best:.4f}s", file=sys.stderr)


if __name__ == "__main__":
    main()

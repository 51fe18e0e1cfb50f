#!/usr/bin/env python
"""Canonical benchmarks on the default JAX platform (TPU when present).

Prints one JSON line per metric {"metric", "value", "unit", "vs_baseline"}:

1. tunnel_first_sync_sec — DIAGNOSTIC: the first device->host pull of this
   process. The tunneled TPU's first d2h is environment-arbitrated and
   erratic (measured 1.4 s to 397 s for the same one-float pull within one
   hour, 2026-08-19); every cold/first-iteration number below should be
   read against it. Excluded from the rollup.
2. shirley-spheres 600x300 spp=32 bounces=8 (the reference README's
   command): Mrays/s (ray segments actually traced / wall seconds — the
   bounce-loop-iterations counting of BASELINE.md). vs_baseline = ratio vs
   the driver-set north-star of 500 Mrays/s on a v5e-8 (the reference
   publishes no numbers), scaled by chip count so a single-chip run is
   compared against its 1/8 share. THE HEADLINE METRIC, printed first
   after the diagnostic.
   Also: shirley_..._first_frame_sec — fresh-process first render wall
   (trace + compile-cache load + handshake share + execute).
3. shirley HQ spp=512 b=16 (BASELINE.json config #4): same Mrays/s units.
4/5. cornell-box / ganesha 600x600 75k photons b=4: SUSTAINED seconds per
   iteration over the reference's default 10-iteration schedule —
   iterations 2-11 of one quiet run, device-side film accumulation, timed
   between two syncs and divided by 10. This is what a production run
   pays per iteration: the renderer dispatches iterations asynchronously,
   so the tunnel's ~27 ms/call round trip overlaps device work. (Rounds
   1-4 synced every iteration and reported min; that methodology charges
   one full tunnel RTT per iteration that quiet runs never pay — both
   numbers appear in the stderr comment for continuity.)
   vs_baseline = round-2 steady state (1.33 / 1.90 s) / value.
   Also: {scene}_first_iter_sec — cold first iteration (trace + compile
   load + first dispatch chain) with vs_baseline = round-4 capture /
   value.
6. ganesha_pt: the same 449k-tri mesh path-traced (BVH8-walk wavefront,
   spp=8 b=8) in honest Mrays/s — the PPM segments-rate optics problem of
   BENCH_r04 (a gather-bound scene scored in ray units) is retired by
   benching the mesh in ray units on an actual ray workload. DIAGNOSTIC,
   excluded from the rollup: the reference never path-traces the mesh
   (its ganesha is PPM-only), so this config has no reference baseline —
   see _run_ganesha_pt's docstring.
7. bench_geomean_vs_baseline — rollup over the perf metrics that have
   reference-anchored baselines (shirley canonical + HQ Mrays/s, cornell
   + ganesha PPM s/iter), printed LAST so the driver's parsed field
   summarizes the round.

PPM scenes are skipped (with a comment line) if their setup fails, so a
regression there can never hide the headline metric.
"""

import json
import math
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

_ROLLUP = []  # vs_baseline ratios of perf metrics (diagnostics excluded)


def emit(metric, value, unit, vs_baseline, rollup=True, digits=4):
    print(json.dumps({"metric": metric, "value": value, "unit": unit,
                      "vs_baseline": round(vs_baseline, digits)}))
    sys.stdout.flush()
    if rollup:
        _ROLLUP.append(vs_baseline)


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
    signal.alarm(2400)  # handshake alone can be ~400 s on a bad day
    _wait_for_device()
    # first d2h of the process — the erratic tunnel handshake, measured
    # up-front against an empty queue so later numbers are attributable
    t0 = time.perf_counter()
    float((jnp.arange(8.0) + 1.0)[0])
    emit("tunnel_first_sync_sec", round(time.perf_counter() - t0, 2), "s",
         1.0, rollup=False)
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
    try:
        _run_hq()
    except Exception as e:
        print(f"# shirley HQ bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    for scene in ("cornell", "ganesha"):
        try:
            _run_ppm(scene)
        except Exception as e:
            print(f"# {scene} bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    try:
        _run_ganesha_pt()
    except Exception as e:
        print(f"# ganesha_pt bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    if _ROLLUP:
        g = math.exp(sum(math.log(max(v, 1e-9)) for v in _ROLLUP)
                     / len(_ROLLUP))
        emit("bench_geomean_vs_baseline", round(g, 4), "x", g,
             rollup=False)


def _build_scene(which):
    if which == "cornell":
        from pathtracer_tpu.models import cornell
        scene, cam, lights = cornell.build(1.0)
        return scene, cam, lights, None, None
    from pathtracer_tpu.models import ganesha
    return ganesha.build("scenes/big_ganesha.ply", 1.0)


def _run_ppm(which: str):
    """first_iter (cold) + sustained s/iter over the reference's default
    10-iteration schedule (iterations 2-11 of an 11-iteration quiet run,
    timed between syncs at iterations 1 and 11)."""
    import numpy as np
    from pathtracer_tpu.ppm import PPMRenderer

    scene, cam, lights, mesh, bbox_override = _build_scene(which)
    baseline = 1.33 if which == "cornell" else 1.90
    first_baseline = 23.19 if which == "cornell" else 41.93  # BENCH_r04
    iters = 11
    marks = {}
    legacy = []
    t_prev = [None]

    def cb(i, img_sum):
        # sync only at the endpoints — per-iteration syncs add one tunnel
        # RTT per iteration that quiet production runs never pay
        if i in (0, iters - 1):
            if img_sum is not None and not isinstance(img_sum, np.ndarray):
                jax.block_until_ready(img_sum)
            marks[i] = time.perf_counter()

    r = PPMRenderer(scene=scene, camera=cam, lights=lights, width=600,
                    height=600, iterations=iters, photon_count=75000,
                    max_bounces=4, verbose=False, mesh=mesh,
                    bbox_override=bbox_override)
    t0 = time.perf_counter()
    r.render(checkpoint_cb=cb)
    first = marks[0] - t0
    steady = (marks[iters - 1] - marks[0]) / (iters - 1)
    emit(f"{which}_600x600_75k_b4_first_iter_sec", round(first, 2), "s",
         first_baseline / first, rollup=False)
    emit(f"{which}_600x600_75k_b4_sec_per_iter", round(steady, 4),
         "s/iter", baseline / steady)
    # legacy methodology (rounds 1-4): 3 iterations, sync each, min of the
    # post-compile ones — printed for cross-round continuity
    def cb2(i, img_sum):
        if img_sum is not None and not isinstance(img_sum, np.ndarray):
            jax.block_until_ready(img_sum)
        now = time.perf_counter()
        if t_prev[0] is not None:
            legacy.append(now - t_prev[0])
        t_prev[0] = now
    r2 = PPMRenderer(scene=scene, camera=cam, lights=lights, width=600,
                     height=600, iterations=3, photon_count=75000,
                     max_bounces=4, verbose=False, mesh=mesh,
                     bbox_override=bbox_override)
    t_prev[0] = time.perf_counter()
    r2.render(checkpoint_cb=cb2)
    print(f"# {which}: first={first:.2f}s sustained={steady:.4f}s/iter "
          f"legacy_synced_iters={[round(t, 3) for t in legacy]}",
          file=sys.stderr)


def _run_hq():
    """BASELINE.json config #4: shirley 600x300 spp=512 b=16, one frame."""
    from pathtracer_tpu.integrator import make_render_fn
    from pathtracer_tpu.models import shirley

    width, height, spp, bounces = 600, 300, 512, 16
    scene, cam, background = shirley.build(width / height)
    render = make_render_fn(cam, background, width, height, spp, bounces)
    img, segs = render(scene)  # compile
    segments = int(jax.device_get(segs))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        img, segs = render(scene)
        segments = int(jax.device_get(segs))
        best = min(best, time.perf_counter() - t0)
    mrays = segments / best / 1e6
    n_chips = len(jax.devices())
    emit("shirley_600x300_spp512_b16_mrays_per_sec", round(mrays, 2),
         "Mrays/s", mrays / (62.5 * n_chips))
    print(f"# HQ segments={segments} best_wall={best:.4f}s",
          file=sys.stderr)


def _run_ganesha_pt():
    """Path-traced ganesha (BVH8-walk wavefront) in honest Mrays/s.

    DIAGNOSTIC (rollup=False): the reference never path-traces the mesh —
    its ganesha executable is PPM-only (ganesha/bin/main.ml), so none of
    BASELINE.json's five reference-anchored configs covers this workload
    and the 62.5 Mrays/s/chip sphere-scene north-star share printed as
    vs_baseline is a continuity number, not a baseline: a 449k-triangle
    BVH walk over incoherent bounce rays costs orders of magnitude more
    per ray than a 10-sphere brute-force test. The rollup stays a geomean
    over configs that HAVE reference baselines."""
    from pathtracer_tpu.integrator import make_render_fn
    from pathtracer_tpu.models import ganesha

    w, h, spp, bounces = 600, 600, 8, 8
    scene, cam, bg, mesh = ganesha.build_pt("scenes/big_ganesha.ply", w / h)
    render = make_render_fn(cam, bg, w, h, spp, bounces, mesh=mesh)
    img, segs = render(scene)  # compile
    segments = int(jax.device_get(segs))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        img, segs = render(scene)
        segments = int(jax.device_get(segs))
        best = min(best, time.perf_counter() - t0)
    mrays = segments / best / 1e6
    n_chips = len(jax.devices())
    emit("ganesha_pt_600x600_spp8_b8_mrays_per_sec", round(mrays, 3),
         "Mrays/s", mrays / (62.5 * n_chips), rollup=False)
    print(f"# ganesha_pt segments={segments} best_wall={best:.4f}s",
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
    t0 = time.perf_counter()
    img, segs = render(scene)
    segments = int(jax.device_get(segs))
    first_frame = time.perf_counter() - t0

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        img, segs = render(scene)
        segments = int(jax.device_get(segs))
        best = min(best, time.perf_counter() - t0)
    mrays = segments / best / 1e6
    n_chips = len(jax.devices())
    target_per_chip = 500.0 / 8.0  # north star is 500 Mrays/s on 8 chips
    emit("shirley_600x300_spp32_b8_mrays_per_sec", round(mrays, 2),
         "Mrays/s", mrays / (target_per_chip * n_chips))
    # 10.5 s = the round-4 warm-process CLI wall (BASELINE.md) — the only
    # prior capture of shirley's cold cost
    emit("shirley_600x300_spp32_b8_first_frame_sec", round(first_frame, 2),
         "s", 10.5 / first_frame, rollup=False)
    print(f"# platform={jax.devices()[0].platform} chips={n_chips} "
          f"segments={segments} best_wall={best:.4f}s", file=sys.stderr)


if __name__ == "__main__":
    main()

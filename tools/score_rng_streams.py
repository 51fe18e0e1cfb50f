"""Score candidate `Random.init 42` streams against the reference repo's
committed render (README confirms shirley-spheres.png is produced by the
current code at 600x300 spp=32, so the sphere LAYOUT in the PNG is a
ground-truth oracle for the RNG stream).

Round-2's search (tools/search_rng_seeding.py) swept OCaml 5 LXM seeding
constructions — but `shirley_spheres/bin/main.ml:1` is `open! Base`, and
Base VENDORS the OCaml-4 lagged-Fibonacci generator (base/src/random.ml is
a copy of the 4.07 stdlib's random.ml), so the stream to match is
utils/ocaml_random.OCaml4Random. This tool scores both families plus a
deliberately-wrong seed as a calibration floor.

Usage: python -m tools.score_rng_streams [spp] [bounces]
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, "/root/repo")

from pathtracer_tpu.models import shirley
from pathtracer_tpu.integrator import make_render_fn
from pathtracer_tpu.io.png import read_png
from pathtracer_tpu.utils.ocaml_random import OCaml4Random, OCaml5Random
from tools.search_rng_seeding import build_scene_from_list


def gen_list(rng):
    """generate_sphere_list with an injected rng object."""
    spheres = []

    def add(center, radius, kind, **kw):
        spheres.append(dict(center=list(center), radius=radius, kind=kind,
                            **kw))

    add((0.0, -1000.0, 0.0), 1000.0, "checker_lambert",
        even=[0.2, 0.3, 0.1], odd=[0.9, 0.9, 0.9], checker=[1000, 2000])
    add((-4.0, 1.0, 0.0), 1.0, "glass")
    add((0.0, 1.0, 0.0), 1.0, "metal", color=[0.7, 0.6, 0.5])
    add((4.0, 1.0, 0.0), 1.0, "lambert", color=[0.1, 0.1, 0.7])
    for a in range(-11, 12):
        for b in range(-11, 12):
            x = a + 0.9 * rng.float(1.0)
            z = b + 0.9 * rng.float(1.0)
            radius = 0.2
            dx, dy, dz = x - 4.0, 0.0, z
            if dx * dx + dy * dy + dz * dz > 0.81:
                roll = rng.float(1.0)
                if roll < 0.8:
                    v2 = [rng.float(1.0) for _ in range(3)]
                    v1 = [rng.float(1.0) for _ in range(3)]
                    add((x, radius, z), radius, "lambert",
                        color=[v1[i] * v2[i] for i in range(3)])
                elif roll < 0.95:
                    g = 0.5 * rng.float(1.0) + 0.5
                    add((x, radius, z), radius, "metal", color=[g, g, g])
                else:
                    add((x, radius, z), radius, "glass")
    return spheres


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ref = read_png("/root/reference/shirley-spheres.png").astype(
        np.float64) / 255.0
    W, H = 600, 300
    cam = shirley.make_camera(W / H)
    render = make_render_fn(cam, shirley.background, W, H, spp, bounces)

    candidates = {
        "base_lagged_fib(42)": OCaml4Random(42),
        "lxm_digest_chain(42)": OCaml5Random(42, "digest_chain"),
        "lxm_append_one(42)": OCaml5Random(42, "append_one"),
        "base_lagged_fib(43) [wrong-seed floor]": OCaml4Random(43),
    }
    results = []
    for label, rng in candidates.items():
        sph = gen_list(rng)
        scene = build_scene_from_list(sph, cam)
        img = np.asarray(render(scene)[0], np.float64)
        rmse = float(np.sqrt(np.mean((img[100:] - ref[100:]) ** 2)))
        results.append((rmse, label, len(sph)))
        print(f"{rmse:.4f}  {label}  n={len(sph)}", flush=True)
    results.sort()
    print("\nbest:", results[0])


if __name__ == "__main__":
    main()

"""Search for the OCaml 5 Random seeding construction by scoring candidate
Shirley scenes against the reference repo's committed render (README confirms
it is produced by the current code at 600x300 spp=32, so the sphere layout in
that PNG is a ground-truth oracle for the RNG stream).

Each candidate defines how Random.init's seed bytes map to the 4-word LXM
state via MD5. We render a cheap preview (spp=1, 2 bounces) and measure RMSE
vs the PNG over the sphere-dominated region; the correct stream should be a
clear outlier.
"""

import hashlib
import itertools
import struct
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from pathtracer_tpu.models import shirley
from pathtracer_tpu.integrator import make_render_fn
from pathtracer_tpu.io.png import read_png
from pathtracer_tpu.scene import SceneBuilder, LAMBERTIAN, METAL, DIELECTRIC, TEX_CHECKER
from pathtracer_tpu.utils import ocaml_random as ocr


def d2_fns():
    return {
        "md5(d1)": lambda b, d1: hashlib.md5(d1).digest(),
        "md5(b+01)": lambda b, d1: hashlib.md5(b + b"\x01").digest(),
        "md5(d1+01)": lambda b, d1: hashlib.md5(d1 + b"\x01").digest(),
        "md5(d1+b)": lambda b, d1: hashlib.md5(d1 + b).digest(),
        "md5(b+d1)": lambda b, d1: hashlib.md5(b + d1).digest(),
        "md5(d1+d1)": lambda b, d1: hashlib.md5(d1 + d1).digest(),
        "md5(b+00)": lambda b, d1: hashlib.md5(b + b"\x00").digest(),
    }


def make_seeder(d2_fn, swap_digests, big_endian):
    fmt = ">QQ" if big_endian else "<QQ"

    def seed_state(seed_ints):
        b = b"".join(struct.pack("<q", ((s + (1 << 63)) % (1 << 64)) - (1 << 63))
                     for s in seed_ints)
        d1 = hashlib.md5(b).digest()
        d2 = d2_fn(b, d1)
        if swap_digests:
            d1, d2 = d2, d1
        i1, i2 = struct.unpack_from(fmt, d1)
        i3, i4 = struct.unpack_from(fmt, d2)
        s = i1
        a = i2 | 1
        x0 = i3 if i3 != 0 else 1
        x1 = i4 if i4 != 0 else 2
        return [s, a, x0, x1]

    return seed_state


def build_scene_from_list(sph, cam):
    b = SceneBuilder()
    for s in sph:
        k = s["kind"]
        if k == "checker_lambert":
            b.add_sphere(s["center"], s["radius"], LAMBERTIAN, color_a=s["even"],
                         color_b=s["odd"], tex_kind=TEX_CHECKER, checker_wh=s["checker"])
        elif k == "lambert":
            b.add_sphere(s["center"], s["radius"], LAMBERTIAN, color_a=s["color"])
        elif k == "metal":
            b.add_sphere(s["center"], s["radius"], METAL, color_a=s["color"])
        else:
            b.add_sphere(s["center"], s["radius"], DIELECTRIC, ior=1.5)
    return b.build(camera=cam, pad_to=704)


def main():
    ref = read_png("/root/reference/shirley-spheres.png").astype(np.float64) / 255.0
    W, H = 600, 300
    cam = shirley.make_camera(W / H)
    render = make_render_fn(cam, shirley.background, W, H, 2, 3)

    results = []
    orig = ocr._seed_state
    for name, d2f in d2_fns().items():
        for swap, be in itertools.product([False, True], [False, True]):
            label = f"{name} swap={int(swap)} be={int(be)}"
            ocr._seed_state = lambda seed, variant=None, f=make_seeder(d2f, swap, be): f(seed)
            sph = shirley.generate_sphere_list(42)
            scene = build_scene_from_list(sph, cam)
            img, _ = render(scene)
            img = np.asarray(img, np.float64)
            rmse = float(np.sqrt(np.mean((img[100:] - ref[100:]) ** 2)))
            results.append((rmse, label, len(sph)))
            print(f"{rmse:.4f}  {label}  n={len(sph)}", flush=True)
    ocr._seed_state = orig
    results.sort()
    print("\nBest:")
    for r in results[:5]:
        print(r)


if __name__ == "__main__":
    main()

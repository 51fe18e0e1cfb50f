"""Broad sweep of `Random.init 42` stream candidates against the committed
reference PNG (see tools/score_rng_streams.py for why the PNG is a stream
oracle). Families:

- lagged-Fibonacci (OCaml-4 stdlib / Base-vendored): as implemented, plus
  the pre-PR#5575 full_init without the 30-bit mask.
- OCaml 5 LXM: all combinations of (digest-word roles: a=i1|s=i2 vs
  s=i1|a=i2) x (second-digest construction) x (digest word endianness).

A matching stream should be a clear outlier below the wrong-stream floor
(~0.25 RMSE at these settings; every round-2 candidate scored there).

Usage: python -m tools.sweep_rng_candidates [spp] [bounces]
"""
import hashlib
import itertools
import struct
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, "/root/repo")

from pathtracer_tpu.models import shirley
from pathtracer_tpu.integrator import make_render_fn
from pathtracer_tpu.io.png import read_png
from tools.search_rng_seeding import build_scene_from_list
from tools.score_rng_streams import gen_list

M64 = (1 << 64) - 1


class LaggedFib:
    def __init__(self, seed, mask_in_init=True):
        self.st = list(range(55))
        self.idx = 0
        accu = b"x"
        seed_arr = [seed]
        for i in range(55 + 55):
            j = i % 55
            accu = hashlib.md5(accu + str(seed_arr[i % 1]).encode()).digest()
            extract = accu[0] | (accu[1] << 8) | (accu[2] << 16) \
                | (accu[3] << 24)
            v = self.st[j] ^ extract
            self.st[j] = (v & 0x3FFFFFFF) if mask_in_init else v

    def bits(self):
        self.idx = (self.idx + 1) % 55
        cur = self.st[self.idx] & 0x3FFFFFFF
        new = (self.st[(self.idx + 24) % 55]
               + (cur ^ ((cur >> 25) & 0x1F))) & 0x3FFFFFFF
        self.st[self.idx] = new
        return new

    def float(self, bound):
        scale = 1073741824.0
        r1 = float(self.bits())
        r2 = float(self.bits())
        return (r1 / scale + r2) / scale * bound


class LXM:
    def __init__(self, seed, d2kind, roles, endian):
        b = struct.pack("<q", seed)
        d1 = hashlib.md5(b).digest()
        d2 = {
            "chain": lambda: hashlib.md5(d1).digest(),
            "append01": lambda: hashlib.md5(b + b"\x01").digest(),
            "d1append01": lambda: hashlib.md5(d1 + b"\x01").digest(),
            "append00": lambda: hashlib.md5(b + b"\x00").digest(),
            "d1b": lambda: hashlib.md5(d1 + b).digest(),
            "bd1": lambda: hashlib.md5(b + d1).digest(),
        }[d2kind]()
        fmt = ">QQ" if endian == "be" else "<QQ"
        i1, i2 = struct.unpack_from(fmt, d1)
        i3, i4 = struct.unpack_from(fmt, d2)
        if roles == "a_first":  # OCaml 5 State.set: st0=a|1, st1=s
            self.a, self.s = i1 | 1, i2
        else:
            self.s, self.a = i1, i2 | 1
        self.x0 = i3 if i3 != 0 else 1
        self.x1 = i4 if i4 != 0 else 2

    def next64(self):
        z = (self.s + self.x0) & M64
        for _ in range(2):
            z = ((z ^ (z >> 32)) * 0xDABA0B6EB09322E3) & M64
        z ^= z >> 32
        self.s = (self.s * 0xD1342543DE82EF95 + self.a) & M64
        q0, q1 = self.x0, self.x1
        q1 ^= q0
        q0 = ((q0 << 24) | (q0 >> 40)) & M64
        q0 = q0 ^ q1 ^ ((q1 << 16) & M64)
        q1 = ((q1 << 37) | (q1 >> 27)) & M64
        self.x0, self.x1 = q0, q1
        return z

    def float(self, bound):
        return (self.next64() >> 11) * (2.0 ** -53) * bound


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    bounces = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ref = read_png("/root/reference/shirley-spheres.png").astype(
        np.float64) / 255.0
    W, H = 600, 300
    cam = shirley.make_camera(W / H)
    render = make_render_fn(cam, shirley.background, W, H, spp, bounces)

    cands = {
        "fib mask": LaggedFib(42, True),
        "fib nomask": LaggedFib(42, False),
    }
    for d2, roles, endian in itertools.product(
            ("chain", "append01", "d1append01", "append00", "d1b", "bd1"),
            ("a_first", "s_first"), ("le", "be")):
        cands[f"lxm {d2} {roles} {endian}"] = LXM(42, d2, roles, endian)

    results = []
    for label, rng in cands.items():
        sph = gen_list(rng)
        scene = build_scene_from_list(sph, cam)
        img = np.asarray(render(scene)[0], np.float64)
        rmse = float(np.sqrt(np.mean((img[100:] - ref[100:]) ** 2)))
        results.append((rmse, label, len(sph)))
        print(f"{rmse:.4f}  {label}  n={len(sph)}", flush=True)
    results.sort()
    print("\ntop5:")
    for r in results[:5]:
        print(r)


if __name__ == "__main__":
    main()

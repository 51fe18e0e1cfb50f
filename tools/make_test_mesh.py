"""Generate a stand-in PLY mesh for the ganesha pipeline (the PBRT
ganesha.ply asset is not redistributable with this repo). Produces a UV
sphere + torus knot-ish displacement positioned where the ganesha camera
looks, with a configurable triangle budget."""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from pathtracer_tpu.io.ply import write_mesh


def uv_sphere(nu, nv, center, radius, displace=0.0, seed=0):
    rs = np.random.RandomState(seed)
    us = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vs = np.linspace(1e-3, np.pi - 1e-3, nv)
    uu, vv = np.meshgrid(us, vs, indexing="ij")
    r = radius * (1.0 + displace * np.sin(5 * uu) * np.sin(4 * vv))
    x = r * np.sin(vv) * np.cos(uu)
    y = r * np.cos(vv)
    z = r * np.sin(vv) * np.sin(uu)
    verts = np.stack([x.ravel(), y.ravel(), z.ravel()], 1) + center
    faces = []
    for i in range(nu):
        for j in range(nv - 1):
            a = i * nv + j
            b = ((i + 1) % nu) * nv + j
            faces.append([a, b, a + 1])
            faces.append([b, b + 1, a + 1])
    return verts, np.asarray(faces)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", default="scenes/test_ganesha.ply")
    ap.add_argument("--tris", type=int, default=100000)
    args = ap.parse_args()
    # choose nu, nv for ~tris triangles: 2*nu*(nv-1) ~ tris
    nu = int(np.sqrt(args.tris / 2))
    nv = max(3, args.tris // (2 * nu) + 1)
    verts, faces = uv_sphere(nu, nv, center=np.array([328.0, 60.0, 150.0]),
                             radius=45.0, displace=0.15)
    write_mesh(args.o, verts, faces)
    print(f"wrote {args.o}: {len(verts)} vertices, {len(faces)} triangles")


if __name__ == "__main__":
    main()

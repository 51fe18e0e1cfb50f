"""A/B benchmark: skip-link walk vs octant-ordered unified-table walk on a
mesh, with real eye rays. Run on TPU.

Usage: python tools/bench_mesh_walk.py [ply_path] [which: both|octant|skiplink]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.models import ganesha
from pathtracer_tpu.ops.bvh import MeshBVH
from pathtracer_tpu.io import ply


def eye_rays(cam, w, h):
    ys, xs = np.mgrid[0:h, 0:w]
    cx = (xs.ravel() + 0.5) / w
    cy = (ys.ravel() + 0.5) / h
    org = np.zeros((w * h, 3), np.float32)
    d = np.asarray(cam.ray_dirs(jnp.asarray(cx), jnp.asarray(cy)))
    return org, d


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/test_ganesha.ply"
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    w = h = 600
    cam = ganesha.make_camera(w / h)

    t0 = time.monotonic()
    p = ply.load(path)
    verts = np.stack([np.asarray(p.data["vertex"][k], np.float64)
                      for k in ("x", "y", "z")], axis=1)
    faces = None
    for el, cols in p.data.items():
        if "vertex_indices" in cols:
            faces = np.asarray(cols["vertex_indices"])
    print(f"load {time.monotonic()-t0:.2f}s, {len(faces)} tris", flush=True)
    vc = cam.transform_points(verts)
    mat = np.zeros(12, np.float32)

    org, d = eye_rays(cam, w, h)
    org_j, d_j = jnp.asarray(org), jnp.asarray(d)

    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    caps_list = ([tuple(int(x) for x in c.split(","))
                  for c in sys.argv[4].split(";")]
                 if len(sys.argv) > 4 else [(48, 96, 0)])
    results = {}
    walks = {"both": ["octant", "skiplink"], "all": ["bvh4", "octant"],
             }.get(which, [which])
    for walk in walks:
        t0 = time.monotonic()
        mesh = MeshBVH(vc, faces, mat, length_cutoff=8, walk=walk)
        print(f"[{walk}] build {time.monotonic()-t0:.2f}s "
              f"depth={mesh.depth}", flush=True)
        for caps in ([None] if walk == "skiplink" else caps_list):
            kw = {"caps": caps} if caps is not None else {}
            jfn = jax.jit(lambda o, dd, tbl, m=mesh, kw=kw: m.intersect(
                o, dd, chunk=chunk, table=tbl, **kw))
            fn = lambda o, dd: jfn(o, dd, mesh.table_j)
            t0 = time.monotonic()
            out = fn(org_j, d_j)
            float(out[0][0])
            compile_s = time.monotonic() - t0
            t0 = time.monotonic()
            reps = 5
            for _ in range(reps):
                out = fn(org_j, d_j)
            float(out[0][0])  # real d2h sync (block_until_ready lies)
            dt = (time.monotonic() - t0) / reps
            hits = np.asarray(out[4]).mean()
            results[walk] = (compile_s, dt)
            print(f"[{walk}] caps={caps} compile+first {compile_s:.2f}s, "
                  f"steady {dt*1e3:.1f} ms/call "
                  f"({w*h/dt/1e6:.2f} Mrays/s), hit_rate={hits:.3f}",
                  flush=True)
    if len(results) == 2:
        c2, d2 = results["octant"]
        c1, d1 = results["skiplink"]
        print(f"speedup: iter {d1/d2:.2f}x, compile {c1/c2:.2f}x")


if __name__ == "__main__":
    main()

"""Is the walk's gather cost per-ROW or per-BYTE? Pads the 16-col walk
table to 32 cols (the traverser only reads cols 0-10, so a padded table is
drop-in via the `table=` argument) and times both widths. If cost is
~per-row, a BVH4 layout (2x the row, ~0.6x the steps) wins; if per-byte,
it loses. Usage: python -m tools.proto_row_width [ply]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pathtracer_tpu.models import ganesha


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/big_ganesha.ply"
    scene, cam, lights, mesh, bbox = ganesha.build(path, 1.0)
    print(f"{mesh.n_tris} tris", flush=True)

    w = h = 600
    ys, xs = np.divmod(np.arange(w * h), w)
    cx = (xs.astype(np.float32) + 0.5) / w
    cy = (ys.astype(np.float32) + 0.5) / h
    d = jnp.asarray(np.asarray(cam.ray_dirs(jnp.asarray(cx),
                                            jnp.asarray(cy))))
    org = jnp.zeros((w * h, 3), jnp.float32)

    t16 = mesh.table_j
    t32 = jnp.concatenate([t16, jnp.zeros_like(t16)], axis=1)
    jax.block_until_ready(t32)
    float(t32[0, 0])

    for name, tbl in (("16col", t16), ("32col", t32)):
        jfn = jax.jit(lambda o, dd, t: mesh.intersect(o, dd, table=t))
        out = jfn(org, d, tbl)
        float(out[0][0])
        t0 = time.monotonic()
        for _ in range(3):
            out = jfn(org, d, tbl)
        float(out[0][0])
        dt = (time.monotonic() - t0) / 3
        print(f"{name}: {dt*1e3:.0f} ms/call", flush=True)


if __name__ == "__main__":
    main()

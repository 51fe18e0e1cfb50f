"""RMSE-vs-spp curve for the f32 pipeline against CPU f64 oracles at the
canonical geometry (shirley 600x300, bounces=8), same positional samples —
extends the spp=32 budget evidence (BASELINE.md) to spp 64/128.

  python -m tools.measure_rmse_curve oracle 64    # CPU f64 oracle -> /tmp
  python -m tools.measure_rmse_curve tpu 64 [backend]

The spp=32 oracle stays the committed scenes/oracle_*.npz; larger-spp
oracles live in /tmp (the curve numbers are recorded in BASELINE.md, the
golden tests pin regressions at small configs).
"""
import os
import sys
import time

import numpy as np


def oracle_path(spp):
    if spp == 32:
        return "scenes/oracle_shirley_600x300_spp32_f64.npz"
    return f"/tmp/oracle_shirley_600x300_spp{spp}_f64.npz"


def main():
    mode = sys.argv[1]
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    w, h, bounces = 600, 300, 8
    import jax

    if mode == "oracle":
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pathtracer_tpu.integrator import make_render_fn
    from pathtracer_tpu.models import shirley

    if mode == "oracle":
        scene, cam, bg = shirley.build(w / h, dtype=jnp.float64)
        render = make_render_fn(cam, bg, w, h, spp, bounces,
                                dtype=jnp.float64, backend="xla")
        t0 = time.monotonic()
        img, segs = render(scene)
        img = np.asarray(img, np.float64)
        print(f"spp={spp} oracle render {time.monotonic()-t0:.0f}s "
              f"segs={int(segs)}", flush=True)
        np.savez_compressed(oracle_path(spp), img=img)
        return

    backend = sys.argv[3] if len(sys.argv) > 3 else None
    scene, cam, bg = shirley.build(w / h)
    render = make_render_fn(cam, bg, w, h, spp, bounces, backend=backend)
    img, segs = render(scene)
    img = np.asarray(img, np.float64)
    g = np.load(oracle_path(spp))["img"]
    rmse = float(np.sqrt(np.mean((img - g) ** 2)))
    mx = float(np.abs(img - g).max())
    print(f"f32 [{backend or 'default'}] vs f64 oracle @600x300 "
          f"spp={spp} b={bounces}: RMSE={rmse:.2e} max={mx:.2e}",
          flush=True)


if __name__ == "__main__":
    main()

"""pathtracer_tpu — a TPU-native (JAX/XLA/Pallas) quasi-Monte-Carlo path tracing
framework with the capabilities of the reference OCaml/Rust renderer
(dalev/path-tracer-ocaml), re-designed TPU-first.

Architecture (inverted from the reference's closure-per-ray recursive design):

- SoA wavefront state: rays/hits live in structure-of-arrays jnp arrays with a
  trailing dim of 3 for vectors; every per-ray quantity is a batched array.
- Bounce-synchronous loop: the recursive `trace_path` bounce loop of the
  reference (integrator.ml:30-68) becomes an unrolled/`lax.scan` loop over
  bounce index carrying (origin, direction, attenuation, alive, radiance).
- Masked material dispatch: the reference's `Scatter.t` ADT branch becomes
  `jnp.where` selection over lambertian/metal/dielectric results.
- Deterministic positional sampling: the Roberts R_d low-discrepancy sequence
  (low_discrepancy_sequence.ml) is a pure function of (offset, dimension) and
  is evaluated here in 64-bit fixed point with uint32 limb arithmetic so it is
  exact-to-2^-64 on TPUs without fp64 hardware.
- Data parallelism: the reference's domainslib tile fork-join becomes
  `shard_map` over a `jax.sharding.Mesh`, with the film reduced by `psum`.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache: renders compile once per machine,
    not once per process (ganesha's PPM graph alone is minutes of compile).
    Override the location with PATHTRACER_TPU_JAX_CACHE; set it empty to
    disable."""
    import os

    loc = os.environ.get("PATHTRACER_TPU_JAX_CACHE")
    if loc == "":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            d = loc or os.path.expanduser("~/.cache/pathtracer_tpu/jax")
            os.makedirs(d, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", d)
            # 1 s threshold: the film filter/finalize programs compile in
            # 1.4-3.9 s each and were re-compiled EVERY process at the old
            # 5 s cutoff (a constant ~5.5 s tail on every CLI render)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

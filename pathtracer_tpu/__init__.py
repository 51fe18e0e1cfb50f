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

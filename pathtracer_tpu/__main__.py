import os

# PATHTRACER_PLATFORM=cpu forces the backend BEFORE any jax use. The env
# var JAX_PLATFORMS alone is not enough on hosts whose TPU plugin forcibly
# prepends itself via jax.config at interpreter start (axon does) — only a
# later jax.config.update wins, so CPU renders/CI need this knob.
_plat = os.environ.get("PATHTRACER_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)

from .cli import main  # noqa: E402

main()

"""One-stop JAX backend/env configuration for entry points.

Must run before the first JAX backend use. Two load-bearing pieces (see
CLAUDE.md "Environment"):

* honor ``JAX_PLATFORMS`` before backend init — with the axon TPU plugin
  on PYTHONPATH the env var alone is NOT enough; a ``JAX_PLATFORMS=cpu``
  run would still attach to the (possibly busy) tunneled TPU and hang.
* persistent compilation cache — the first remote XLA compile of each
  recipe is 1-3 min; subsequent runs are instant.
"""
import os


def configure_jax() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

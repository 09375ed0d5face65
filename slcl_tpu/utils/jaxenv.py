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

    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        jax.config.update("jax_platforms", plat)
    # Separate cache namespaces per backend: axon-attached processes compile
    # remotely, and XLA:CPU AOT entries built on the compile-server machine
    # fail to load on this host (cpu_aot_loader machine-feature mismatch;
    # worst case hung collectives/SIGABRT in multi-device CPU runs). Pure-CPU
    # runs therefore never share the TPU-process cache dir.
    cpu_first = plat.lower().split(",")[0].strip() == "cpu"
    default = "/tmp/jax_cache_cpu" if cpu_first else "/tmp/jax_cache"
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", default))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

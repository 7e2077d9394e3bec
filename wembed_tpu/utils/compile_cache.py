"""Persistent XLA compilation cache.

The TPU compile service in this environment has a very high cold-compile
latency (hundreds of seconds for the first kernel of a process); JAX's
persistent compilation cache reduces repeat compiles to ~1s.  Enabled at
package import unless the user configured a cache dir themselves or set
``WEMBED_TPU_NO_COMPILE_CACHE=1``.
"""

from __future__ import annotations

import os


def enable_default_compile_cache() -> None:
    if os.environ.get("WEMBED_TPU_NO_COMPILE_CACHE"):
        return
    # Only cache for TPU backends: the remote TPU compile service is the
    # slow path worth caching, while cached XLA:CPU AOT artifacts encode
    # machine features of the compile host and can SIGILL elsewhere.
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if not any(p in platforms for p in ("tpu", "axon")):
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # respect an existing configuration
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "wembed_tpu_xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # never let cache setup break the library
        pass

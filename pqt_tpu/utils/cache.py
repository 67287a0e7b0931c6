"""Persistent XLA compilation cache setup.

The engine's jitted programs (training loop, encode, query pipeline) are
large; on TPU backends that compile remotely, a cold compile can take
minutes.  JAX's persistent compilation cache stores the compiled executable
keyed by HLO + platform, so every process after the first pays ~1s instead.

The reference has no analog (CUDA kernels are compiled at build time); this
restores that "compile once" property for the JIT world.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get("PQT_COMPILE_CACHE",
                              os.path.expanduser("~/.cache/pqt_tpu_xla"))

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's on-disk compilation cache (idempotent).

    Called by the CLI tools and benchmarks; library users opt in explicitly.
    Returns the cache directory in use.
    """
    global _enabled
    import jax

    d = cache_dir or _DEFAULT_DIR
    if _enabled:
        return d
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return d

"""Process-wide JAX configuration: persistent compilation cache.

The fold-step graph takes minutes to compile per (N, K, M, ...) config;
the persistent cache makes every subsequent process start instantly.
Imported for its side effect by the JAX-facing modules.
"""

import os
from pathlib import Path

import jax

_cache = os.environ.get("RAFFT_JAX_CACHE",
                        os.path.expanduser("~/.cache/rafft_tpu_jax"))
try:
    Path(_cache).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is an optimisation only
    pass

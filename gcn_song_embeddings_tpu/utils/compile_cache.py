"""Persistent XLA compilation cache setup.

On the tunneled TPU platform first-time compiles are expensive (the 500-hop
walk scan costs minutes of remote compile); a persistent cache makes every
subsequent process reuse them.  Call `enable_compile_cache()` early (the
CLI and trainers do this automatically).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/gcn_song_embeddings_tpu/xla")
_enabled = False


def enable_compile_cache(cache_dir: str | None = None) -> str:
    global _enabled
    import jax

    cache_dir = cache_dir or os.environ.get(
        "GCN_TPU_COMPILE_CACHE", _DEFAULT_DIR)
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass  # older jax without the knobs
        _enabled = True
    return cache_dir

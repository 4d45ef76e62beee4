"""Persistent XLA compilation cache.

First-time compiles of the sweep programs cost ~10-30 s; caching them on
disk makes every CLI invocation after the first start in ~1 s. Verified to
work through this environment's remote-compile path. Disable with
SNESIMAGE_NO_CACHE=1 or redirect with SNESIMAGE_CACHE_DIR.
"""

from __future__ import annotations

import os
import pathlib


def enable_compile_cache() -> None:
    if os.environ.get("SNESIMAGE_NO_CACHE"):
        return
    cache_dir = os.environ.get(
        "SNESIMAGE_CACHE_DIR",
        str(pathlib.Path.home() / ".cache" / "snesimage_tpu" / "jax"),
    )
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

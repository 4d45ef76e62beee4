"""Persistent XLA compilation cache.

First-time compiles of the sweep programs cost ~10-30 s; caching them on
disk makes every CLI invocation after the first start in ~1 s. Verified to
work through this environment's remote-compile path. Disable with
SNESIMAGE_NO_CACHE=1 or redirect with SNESIMAGE_CACHE_DIR.

The cache directory is namespaced by a host-CPU fingerprint: XLA:CPU
stores AOT-compiled machine code whose cache key does NOT include the
host's CPU feature set, so entries written on one machine can be loaded
on another with different features — observed to SIGSEGV the process
mid-suite after this VM migrated hosts (the loader only *warns*:
"Machine type used for XLA:CPU compilation doesn't match ... could lead
to execution errors such as SIGILL"). A per-CPU directory turns that
load into a clean miss. TPU entries don't depend on host CPU features,
but a fresh dir after a migration only costs one re-compile each.
"""

from __future__ import annotations

import hashlib
import os
import pathlib


def _cpu_fingerprint() -> str:
    """Stable short hash of this host's CPU feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def enable_compile_cache() -> None:
    if os.environ.get("SNESIMAGE_NO_CACHE"):
        return
    base = os.environ.get(
        "SNESIMAGE_CACHE_DIR",
        str(pathlib.Path.home() / ".cache" / "snesimage_tpu" / "jax"),
    )
    cache_dir = str(pathlib.Path(base) / _cpu_fingerprint())
    pathlib.Path(cache_dir).mkdir(parents=True, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

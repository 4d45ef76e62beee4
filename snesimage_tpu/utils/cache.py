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
    """Stable short hash of this host's CPU identity + feature set.

    The flags line alone is NOT enough: two VM hosts were observed with
    identical /proc/cpuinfo flags but different LLVM-detected feature
    sets (the migrated host's XLA:CPU AOT entries carried
    +prefer-no-scatter/+prefer-no-gather the new host lacks — the
    loader warns "could lead to execution errors such as SIGILL"), so
    the hash also covers family/model/stepping/microcode/model-name,
    which differ across such hosts."""
    try:
        with open("/proc/cpuinfo") as f:
            ident: list[str] = []
            feats = ""
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in (
                    "cpu family", "model", "model name", "stepping",
                    "microcode",
                ) and len(ident) < 5:
                    ident.append(line.strip())
                elif key in ("flags", "Features") and not feats:
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
            if feats or ident:
                blob = "|".join(ident) + "||" + feats
                return hashlib.sha256(blob.encode()).hexdigest()[:12]
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

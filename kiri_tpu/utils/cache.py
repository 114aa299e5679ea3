"""Persistent XLA compilation cache, enabled at package import.

Fresh processes otherwise recompile every (batch-bucket, width-bucket,
step-bucket) program — ~100 s each for the flagship encode on a tunneled
TPU backend. With the on-disk cache a cold process replays them in seconds
(measured 265 s -> 27 s for the four width-bucket encode programs).

Opt out with KIRI_TPU_CACHE=0; override the location with
KIRI_TPU_CACHE_DIR (default ~/.cache/kiri_tpu/xla).
"""
from __future__ import annotations

import os
from pathlib import Path

_enabled = False


def enable_persistent_cache() -> bool:
    """Idempotently point JAX at the on-disk compilation cache."""
    global _enabled
    if _enabled:
        return True
    flag = os.environ.get("KIRI_TPU_CACHE", "1")
    if flag == "0":
        return False
    try:
        import jax

        # Default-on only for accelerator backends: replayed CPU AOT blobs
        # carry compile-machine feature flags that may not match this host
        # (XLA warns about possible SIGILL). KIRI_TPU_CACHE=force overrides.
        if flag != "force" and jax.default_backend() == "cpu":
            return False

        cache_dir = os.environ.get(
            "KIRI_TPU_CACHE_DIR",
            str(Path.home() / ".cache" / "kiri_tpu" / "xla"))
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _enabled = True
        return True
    except Exception:
        return False

"""Persistent XLA compilation cache.

Cold compiles of the big programs (distillation teacher+student, flagship
train step) take minutes through a remote-compile TPU runtime; the persistent
cache makes every subsequent process start warm. Enabled by the CLI drivers;
set $SPECTRE_NO_COMPILE_CACHE to disable.
"""

from __future__ import annotations

import os

import jax


def enable_compilation_cache(path: str | None = None) -> str | None:
    if os.environ.get("SPECTRE_NO_COMPILE_CACHE"):
        return None
    path = path or os.environ.get("SPECTRE_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/spectre_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path

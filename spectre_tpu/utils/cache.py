"""Persistent XLA compilation cache.

Cold compiles of the big programs (distillation teacher+student, flagship
train step) take minutes through a remote-compile TPU runtime; the persistent
cache makes every subsequent process start warm. Enabled by the CLI drivers;
set $SPECTRE_NO_COMPILE_CACHE to disable.

CPU cache entries are namespaced per HOST MACHINE TYPE: XLA:CPU serializes
AOT executables whose cache key does NOT include the compile machine's CPU
features, so a cache written on one VM host and read on another (live
migration, session restart onto different hardware) loads foreign machine
code — cpu_aot_loader then warns "could lead to execution errors such as
SIGILL", and we have observed exactly that as silently hung multi-process
workers mid-collective. TPU executables are keyed by device kind and do not
have this problem; only the cpu platform path gets the fingerprint suffix.
"""

from __future__ import annotations

import hashlib
import os

import jax


def _host_cpu_fingerprint() -> str:
    """A stable fingerprint of THIS host's CPU feature set (the 'flags'
    line of /proc/cpuinfo — the same feature list cpu_aot_loader compares),
    so caches from a different machine type land in a different directory."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        pass
    if not feats:
        import platform

        feats = f"{platform.machine()}|{platform.processor()}"
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> str | None:
    if os.environ.get("SPECTRE_NO_COMPILE_CACHE"):
        return None
    path = path or os.environ.get("SPECTRE_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/spectre_tpu_xla"))
    # JAX_PLATFORMS is the env-only platform pin (tests and multihost
    # workers set it to "cpu"); checking it avoids initializing backends
    # here — this runs at package import time
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        path = os.path.join(path, f"cpu-{_host_cpu_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path

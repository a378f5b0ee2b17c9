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
    """A stable fingerprint of THIS host's CPU identity, so caches from a
    different machine type land in a different directory.

    Hashing only the cpuinfo 'flags' line is NOT enough: LLVM tuning
    features such as +prefer-no-gather/+prefer-no-scatter are derived from
    the CPU family/model/stepping/microcode (Downfall-class mitigations),
    not from the flags line, so two hosts with identical flags can still
    produce mutually-incompatible AOT code (observed: cpu_aot_loader
    machine-feature warnings inside an already-fingerprinted cache dir
    after a VM migration between Xeon generations). Include the identity
    lines alongside the flags."""
    parts: list[str] = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "vendor_id",
                                    "cpu family", "model", "stepping",
                                    "microcode", "CPU implementer",
                                    "CPU part", "CPU revision")):
                    line = line.strip()
                    if line not in parts:  # dedupe identical per-core lines
                        parts.append(line)
    except OSError:
        pass
    if not parts:
        import platform

        parts = [f"{platform.machine()}|{platform.processor()}"]
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:12]


def _cpu_first(platforms: str | None) -> bool:
    """True when a JAX platform priority list selects cpu first."""
    return bool(platforms) and platforms.split(",")[0].strip().lower() == "cpu"


def enable_compilation_cache(path: str | None = None) -> str | None:
    if os.environ.get("SPECTRE_NO_COMPILE_CACHE"):
        return None
    path = path or os.environ.get("SPECTRE_COMPILE_CACHE",
                                  os.path.expanduser("~/.cache/spectre_tpu_xla"))
    # Namespace when the run is pinned to the cpu platform. Two pinning
    # paths exist: the JAX_PLATFORMS env var (tests, multihost workers) and
    # jax.config.update("jax_platforms", "cpu") (drivers, the verify smoke).
    # Neither alone is authoritative here: a sitecustomize accelerator
    # bootstrap can pin the CONFIG to an accelerator-first list while the
    # env var says "cpu" (worker subprocesses that will re-pin the config
    # to cpu AFTER this import-time call — multihost_smoke.py:59), and a
    # driver's config pin isn't reflected in the env. The OR is the right
    # heuristic for this codebase: env=cpu is only ever set by our own
    # test/worker launchers that genuinely run on cpu, so the false-positive
    # case (env=cpu process actually running the accelerator, TPU entries
    # landing in the per-host dir) does not occur. Both sources are
    # readable without initializing backends; this runs at package import
    # time AND again
    # from each repl driver's main (by which point any config pin has been
    # applied, so the later call corrects an import-time miss). Only a
    # cpu-FIRST pin means cpu executables dominate the cache; an
    # accelerator-first list keeps the shared dir so the (host-independent)
    # TPU entries stay warm across VM migrations.
    if _cpu_first(os.environ.get("JAX_PLATFORMS")) or _cpu_first(
            getattr(jax.config, "jax_platforms", None)):
        path = os.path.join(path, f"cpu-{_host_cpu_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path

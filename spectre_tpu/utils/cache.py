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


def _cpuid_dump() -> str | None:
    """Raw CPUID leaves of this host, as hex text (x86_64 only).

    /proc/cpuinfo is NOT authoritative under virtualization: GCP reports
    identical identity lines (family 6 model 207 stepping 2, microcode 0x1)
    on hosts whose hypervisor-masked CPUID differs in exactly the bits LLVM
    derives tuning features from (+prefer-no-gather/+prefer-no-scatter —
    Downfall-class mitigations), so two hosts hash identically here while
    cpu_aot_loader still rejects each other's AOT code (observed THIS repo,
    round 4: machine-feature warnings inside an already-fingerprinted
    cache dir). LLVM reads CPUID directly; so must the fingerprint. A tiny
    executable-mmap thunk keeps it dependency-free and in-process.

    Caveat discovered while validating this (round 4): the
    "+prefer-no-gather is not supported on the host machine" warnings
    THEMSELVES are intrinsic to this jaxlib and fire even when an entry is
    reloaded on the very host that wrote it seconds earlier (measured:
    fresh compile run warns 0x, same-host reload warns on every load) —
    the AOT writer embeds LLVM *tuning* preferences in the feature list
    while the loader validates against CPUID-derived host features, which
    never contain tuning prefs. So those two warning lines are benign
    noise, NOT evidence of foreign code; the fingerprint still guards the
    real cross-machine case where actual ISA features differ."""
    import ctypes
    import mmap
    import platform
    import struct

    if platform.machine() != "x86_64":
        return None
    # void f(uint32_t io[4]): eax=io[0], ecx=io[1]; cpuid; io = eax,ebx,ecx,edx
    code = bytes([
        0x53,                    # push rbx   (callee-saved, cpuid clobbers)
        0x8B, 0x07,              # mov eax, [rdi]
        0x8B, 0x4F, 0x04,        # mov ecx, [rdi+4]
        0x0F, 0xA2,              # cpuid
        0x89, 0x07,              # mov [rdi], eax
        0x89, 0x5F, 0x04,        # mov [rdi+4], ebx
        0x89, 0x4F, 0x08,        # mov [rdi+8], ecx
        0x89, 0x57, 0x0C,        # mov [rdi+12], edx
        0x5B,                    # pop rbx
        0xC3,                    # ret
    ])
    try:
        buf = mmap.mmap(-1, len(code),
                        prot=mmap.PROT_READ | mmap.PROT_WRITE | mmap.PROT_EXEC)
        buf.write(code)
        addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
        fn = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_uint32))(addr)

        io = (ctypes.c_uint32 * 4)()

        def cpuid(leaf: int, subleaf: int = 0) -> tuple[int, int, int, int]:
            io[0], io[1], io[2], io[3] = leaf, subleaf, 0, 0
            fn(io)
            return tuple(io)

        out: list[str] = []
        max_basic = min(cpuid(0)[0], 0x20)
        for leaf in range(max_basic + 1):
            # subleaf-indexed leaves: dump the first few subleaves (7 =
            # structured extended features — where the mitigation bits live)
            subleaves = range(3) if leaf in (0x4, 0x7, 0xD, 0x12, 0x14) \
                else range(1)
            for sub in subleaves:
                out.append("%08x.%x:%08x%08x%08x%08x"
                           % ((leaf, sub) + cpuid(leaf, sub)))
        max_ext = cpuid(0x80000000)[0]
        if 0x80000000 <= max_ext:
            for leaf in range(0x80000000, min(max_ext, 0x80000020) + 1):
                out.append("%08x.0:%08x%08x%08x%08x"
                           % ((leaf,) + cpuid(leaf)))
        del fn  # release before the mmap buffer
        return "\n".join(out)
    except Exception:
        return None


def _host_cpu_fingerprint() -> str:
    """A stable fingerprint of THIS host's CPU identity, so caches from a
    different machine type land in a different directory.

    Primary source: the raw CPUID leaves (what LLVM's host detection
    actually reads — see _cpuid_dump for why /proc/cpuinfo identity lines
    are insufficient under virtualization). cpuinfo lines are appended as
    a secondary signal and serve as the fallback on non-x86 hosts."""
    parts: list[str] = []
    cpuid = _cpuid_dump()
    if cpuid:
        parts.append(cpuid)
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

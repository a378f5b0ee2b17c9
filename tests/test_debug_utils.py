import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spectre_tpu.utils import check_finite, deterministic_mode, enable_nan_checks


def test_nan_checks_toggle():
    enable_nan_checks(True)
    with pytest.raises(FloatingPointError):
        jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    enable_nan_checks(False)
    out = jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0))
    assert np.isnan(np.asarray(out))


def test_deterministic_mode_pins_precision():
    deterministic_mode(True)
    assert jax.config.jax_default_matmul_precision == "highest"
    deterministic_mode(False)


def test_check_finite_runs_inside_jit(capfd):
    @jax.jit
    def f(x):
        check_finite({"x": x}, "batch")
        return x * 2

    f(jnp.ones(4)).block_until_ready()


def test_train_loop_model_parallel_smoke(tmp_path):
    """model_parallel=2 over the 8-device CPU mesh trains end to end."""
    from types import SimpleNamespace

    from spectre_tpu.train.loop import train_from_config

    cfg = SimpleNamespace(
        model="spectre_vit", method="permut_mix", dataset="mnist",
        img_size=8, patch_size=4, in_channels=1, num_classes=10,
        embed_dim=16, num_encoders=1, num_heads=2, hidden_dim=32,
        dropout=0.0, batch_size=8, val_batch_size=64, epochs=1,
        learning_rate=1e-3, random_seed=0,
        compute_dtype="float32", param_dtype="float32",
        checkpoint_dir=str(tmp_path), model_parallel=2,
    )
    result = train_from_config(cfg, max_steps=2, synthetic=True,
                               checkpoint=False, write_metrics=False)
    assert int(result.state.step) == 2


def test_compilation_cache_namespaces_cpu_pins(tmp_path, monkeypatch):
    """The persistent-cache dir must be host-fingerprinted whenever the run
    is pinned cpu-FIRST by EITHER pinning path (env var or jax.config) —
    XLA:CPU AOT entries embed machine code for the compile host's exact CPU
    model, and a VM migration between hosts that differ only in LLVM tuning
    features (prefer-no-gather et al., derived from model/stepping, not the
    cpuinfo flags line) has produced SIGILL-class hangs from foreign entries.
    Accelerator-first lists keep the shared dir (TPU entries are
    host-independent)."""
    import jax

    from spectre_tpu.utils.cache import (_cpu_first, _host_cpu_fingerprint,
                                         enable_compilation_cache)

    assert _cpu_first("cpu")
    assert _cpu_first("cpu,axon")
    assert not _cpu_first("axon,cpu")  # accelerator-first: shared dir
    assert not _cpu_first("")
    assert not _cpu_first(None)

    fp = _host_cpu_fingerprint()
    assert len(fp) == 12
    assert fp == _host_cpu_fingerprint()  # stable within a host

    # The test suite itself pins cpu (conftest sets both paths), so a real
    # call must land in the fingerprinted subdir of the requested root.
    monkeypatch.setenv("SPECTRE_COMPILE_CACHE", str(tmp_path))
    monkeypatch.delenv("SPECTRE_NO_COMPILE_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        path = enable_compilation_cache()
        assert path == str(tmp_path / f"cpu-{fp}")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cpuid_probe_reads_real_leaves():
    """The fingerprint's primary source must be the RAW CPUID leaves —
    /proc/cpuinfo is hypervisor-virtualized (identical identity lines on
    hosts whose CPUID differs in the bits LLVM derives +prefer-no-gather
    from; observed round 4 as foreign-AOT warnings inside a fingerprinted
    dir). On x86_64 the probe must work, be stable, and carry the leaves
    LLVM's host detection reads."""
    import platform

    from spectre_tpu.utils.cache import _cpuid_dump

    d = _cpuid_dump()
    if platform.machine() != "x86_64":
        assert d is None
        return
    assert d is not None and d == _cpuid_dump()
    lines = d.splitlines()
    leaves = {ln.split(":")[0] for ln in lines}
    assert "00000000.0" in leaves      # vendor
    assert "00000001.0" in leaves      # family/model/stepping
    assert "00000007.0" in leaves      # structured extended features
    assert "00000007.1" in leaves      # subleaf enumeration works
    assert any(l.startswith("80000000") for l in leaves)  # extended range
    # leaf 0 must decode to a known vendor string, proving the thunk
    # actually executed CPUID rather than returning zeroed memory
    eax_line = next(ln for ln in lines if ln.startswith("00000000.0:"))
    regs = eax_line.split(":")[1]
    ebx, ecx, edx = regs[8:16], regs[16:24], regs[24:32]
    vendor = bytes.fromhex(ebx)[::-1] + bytes.fromhex(edx)[::-1] \
        + bytes.fromhex(ecx)[::-1]
    assert vendor in (b"GenuineIntel", b"AuthenticAMD"), vendor

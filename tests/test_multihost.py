"""Multi-process (multi-host) path: 2 subprocesses, one global mesh.

Exercises repl/train.py's ``--multihost`` machinery (jax.distributed) that a
single-host run never executes: coordinator bring-up, a 4-device global mesh
spanning 2 processes (2 virtual CPU devices each), a data-parallel train
step assembled from per-process local shards, and an orbax checkpoint
save/restore in the multi-process setting. VERDICT r1 missing #6.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _spawn_worker(cmd, env, tmp_path, pid):
    """Worker stderr goes to a FILE, never a pipe: with two coupled workers,
    draining pipes sequentially deadlocks — communicate(proc0) does not
    drain proc1's stderr, so once proc1 fills the 64 KB pipe buffer (cold
    XLA cache emits multi-KB warnings) it blocks mid-write, its collectives
    stall, and proc0 never finishes either. Seen intermittently in CI;
    stdout stays a pipe (one small JSON line by contract).
    """
    errfile = open(os.path.join(str(tmp_path), f"worker{pid}.stderr"), "w+")
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=errfile,
                            env=env, text=True)
    return proc, errfile


def _await_worker(p, errfile):
    try:
        out, _ = p.communicate(timeout=1500)
    except subprocess.TimeoutExpired:
        # dump where the worker was stuck instead of a bare TimeoutExpired
        p.kill()
        out, _ = p.communicate()
        errfile.seek(0)
        err = errfile.read()
        errfile.close()
        raise AssertionError(
            f"worker timed out after 1500s:\nstdout={out}\n"
            f"stderr tail={err[-3000:]}")
    errfile.seek(0)
    err = errfile.read()
    errfile.close()
    assert p.returncode == 0, f"worker failed:\nstdout={out}\nstderr={err[-3000:]}"
    return json.loads(out.strip().splitlines()[-1])


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step_and_checkpoint(tmp_path):
    port = _free_port()
    ckpt_dir = str(tmp_path / "ckpt")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # each worker gets its own XLA_FLAGS (2 virtual devices); scrub the
        # conftest's 8-device flag so the worker sets its own
        env["XLA_FLAGS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(_spawn_worker(
            [sys.executable, "-m", "spectre_tpu.parallel.multihost_smoke",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--ckpt-dir", ckpt_dir], env, tmp_path, pid))

    outs = [_await_worker(p, ef) for p, ef in procs]

    for o in outs:
        assert o["process_count"] == 2
        assert o["global_devices"] == 4
        assert o["step"] == 1
        assert o["restore_exact"] is True
    # SPMD: both processes computed the same global loss
    assert abs(outs[0]["loss"] - outs[1]["loss"]) < 1e-6


def test_two_process_fsdp_step_and_sharded_checkpoint(tmp_path):
    """ZeRO-3 across processes: params + AdamW moments sharded over a data
    axis that SPANS both hosts (each process holds only its shards, built
    from the identical seeded init by fsdp._put), the pinned train step, and
    an orbax save/restore of the sharded layout."""
    port = _free_port()
    ckpt_dir = str(tmp_path / "ckpt")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(_spawn_worker(
            [sys.executable, "-m", "spectre_tpu.parallel.multihost_smoke",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--ckpt-dir", ckpt_dir, "--fsdp"], env, tmp_path, pid))

    outs = [_await_worker(p, ef) for p, ef in procs]

    for o in outs:
        assert o["process_count"] == 2
        assert o["global_devices"] == 4
        assert o["step"] == 1
        assert o["fsdp_sharded"] is True
        assert o["restore_exact"] is True
    # SPMD: both processes computed the same global loss
    assert abs(outs[0]["loss"] - outs[1]["loss"]) < 1e-6


def test_two_process_full_train_loop(tmp_path):
    """The REAL train_from_config across 2 processes: strided per-process
    data slices, prefetch staging via make_array_from_process_local_data,
    masked validation, process-0-only metric writing."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(_spawn_worker(
            [sys.executable, "-m", "spectre_tpu.parallel.multihost_smoke",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--ckpt-dir", str(tmp_path), "--train-loop"], env, tmp_path, pid))
    outs = [_await_worker(p, ef) for p, ef in procs]
    for o in outs:
        assert o["process_count"] == 2
        assert o["step"] == 2
        assert 0.0 <= o["val_accuracy"] <= 1.0
    # replicated eval: every process derives the same global val accuracy
    assert outs[0]["val_accuracy"] == outs[1]["val_accuracy"]


def test_two_process_distill_loop(tmp_path):
    """The REAL distill_from_config across 2 processes: per-process
    teacher-logit cache (each process precomputes only its data slice),
    sliced dual-view batches, fused KD+CE step, masked student eval."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        procs.append(_spawn_worker(
            [sys.executable, "-m", "spectre_tpu.parallel.multihost_smoke",
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--ckpt-dir", str(tmp_path), "--distill-loop"], env, tmp_path, pid))
    outs = [_await_worker(p, ef) for p, ef in procs]
    for o in outs:
        assert o["process_count"] == 2
        assert o["step"] == 2
    # SPMD: the KD+CE loss is a global reduction — identical on all processes
    assert abs(outs[0]["loss"] - outs[1]["loss"]) < 1e-6

"""Test harness: run everything on a virtual 8-device CPU mesh.

Standard JAX fake-multi-device recipe (SURVEY.md §4). This image's
sitecustomize imports jax at interpreter start (to register the TPU plugin),
so mutating ``JAX_PLATFORMS`` here is too late — the platform must be forced
through ``jax.config`` instead, which takes effect as long as no backend has
been initialized yet. ``XLA_FLAGS`` is read lazily at backend init, so the
host-device-count flag still works from here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs[0]}"
    assert len(devs) == 8, f"expected 8 virtual devices, got {devs}"


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---- shared native-runtime helpers (used by test_native + test_serving) ----

import subprocess
from types import SimpleNamespace

import pytest

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
NATIVE_BUILD_DIR = os.path.join(REPO_ROOT, "native", "build")


@pytest.fixture(scope="session")
def native_build():
    """Build the native runtime once per test session."""
    r = subprocess.run(["make", "-C", os.path.join(REPO_ROOT, "native")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return NATIVE_BUILD_DIR


def tiny_export_cfg(**over):
    """Tiny flagship-topology config for export/native/serving tests."""
    cfg = SimpleNamespace(
        model="spectre_vit", method="permut_mix", dataset="mnist",
        img_size=8, patch_size=4, in_channels=3, num_classes=10,
        embed_dim=16, num_encoders=2, num_heads=2, hidden_dim=32,
        dropout=0.0, batch_size=4, epochs=1, learning_rate=1e-3,
        random_seed=0, compute_dtype="float32", param_dtype="float32",
    )
    for k, v in over.items():
        setattr(cfg, k, v)
    return cfg

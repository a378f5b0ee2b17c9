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

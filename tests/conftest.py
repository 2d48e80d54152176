"""Test configuration: force CPU + float64 so CI needs no TPU and parity
tests compare apples-to-apples with the C++ double-precision reference.
A virtual 8-device mesh backs the multi-chip sharding tests."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The deployment environment pins JAX_PLATFORMS=axon via a site hook, so the
# env var alone is not enough — set the config explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402
import pathlib  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def goldens_dir():
    return pathlib.Path(__file__).resolve().parent / "goldens"

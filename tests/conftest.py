"""Test harness: run everything on a virtual 8-device CPU platform.

This is the TPU-native analogue of a fake backend (SURVEY.md §4): multi-device
sharding tests run against `--xla_force_host_platform_device_count=8` without
real chips. Must be set before jax initialises.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

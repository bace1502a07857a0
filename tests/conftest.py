"""Test harness: run everything on a virtual 8-device CPU platform.

This is the TPU-native analogue of a fake backend (SURVEY.md §4): multi-device
sharding tests run against `--xla_force_host_platform_device_count=8` without
real chips.

Platform note: this image's sitecustomize imports jax and registers the
'axon' TPU plugin at interpreter start, so the JAX_PLATFORMS *env var* is
already consumed; forcing CPU requires jax.config.update after import. The
CPU client itself is created lazily, so XLA_FLAGS set here still takes
effect for the host-device count.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

"""Test configuration.

Tests always run on a virtual 8-device CPU mesh so that multi-chip sharding
paths (shard_map / pjit over a Mesh) are exercised without TPU hardware; the
benchmark (bench.py) is what uses the real chip.

This image boots an `axon` remote-TPU PJRT plugin from sitecustomize.py and
exports JAX_PLATFORMS=axon, and jax is already imported by the time pytest
loads this file — so the platform must be forced via jax.config, not env.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    d = jax.devices()
    assert len(d) >= 8, f"expected >=8 virtual devices, got {len(d)}"
    return d[:8]

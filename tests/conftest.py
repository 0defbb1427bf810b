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

# Persistent XLA compilation cache: the gate's wall time on this 4-core
# box is dominated by repeat jit compiles (every xdist worker re-lowers
# the same programs each run).  Cache entries are keyed on HLO + flags,
# so the 8-virtual-device mesh programs cache correctly too.  Verified
# working on the CPU backend with jax 0.9.0.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".scratch",
                          "jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    d = jax.devices()
    assert len(d) >= 8, f"expected >=8 virtual devices, got {len(d)}"
    return d[:8]

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


def worker_port_offset() -> int:
    """Unique port offset per pytest-xdist worker (gw0, gw1, ...) so
    test-level load distribution can't collide networked-fixture ports."""
    w = os.environ.get("PYTEST_XDIST_WORKER", "gw0")
    try:
        return 20 * int(w[2:])
    except ValueError:
        return 0


def build_native(src_dir: str, bin_path: str) -> bool:
    """Build a gitignored C++ test binary at most once ACROSS xdist
    workers.  On a fresh checkout several workers can reach their
    firmware/camera fixtures at the same time; concurrent ``make`` runs
    on the same object files corrupt the build, so serialize on an
    exclusive flock and re-check under the lock.  Returns False when no
    ``make`` is available (caller should skip)."""
    import fcntl
    import shutil
    import subprocess

    if os.path.exists(bin_path):
        return True
    if shutil.which("make") is None:
        return False
    with open(os.path.join(src_dir, ".build.lock"), "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        if not os.path.exists(bin_path):
            subprocess.run(["make", "-C", src_dir], check=True,
                           capture_output=True)
    return True

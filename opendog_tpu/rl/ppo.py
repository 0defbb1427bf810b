"""PPO — one jitted engine, two reference behaviours.

``loss="clip"``   reproduces the SB3 PPO configuration the reference trains
                  with (clipped surrogate, lr 1e-4, n_steps 2048, batch 512,
                  10 epochs, gamma .99, ent .005, clip .2, grad-norm .5 —
                  ``train/train.py:117-130``).
``loss="plain"``  reproduces the hand-rolled sim2real stack: multiple epochs
                  of vanilla policy gradient on normalised GAE advantages
                  with an MSE value loss (``sim2real/train.py:553-570``).

TPU-first: the rollout is a ``lax.scan`` over vmapped envs (thousands of
on-device envs replace the reference's 4 SubprocVecEnv worker processes),
GAE is a reverse scan, the update is a scanned minibatch-epoch loop; one
``train_chunk`` call = collect + update entirely on device.  Hyperparameters
that the adaptive scheduler moves (lr, entropy coef) enter as *traced*
scalars so retuning never recompiles.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..envs.base import Env, Transition
from . import networks


class PPOConfig(NamedTuple):
    num_envs: int = 8
    n_steps: int = 256           # rollout length per env
    num_epochs: int = 10
    minibatch_size: int = 512
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    loss: str = "clip"           # "clip" (SB3) | "plain" (sim2real custom)
    normalize_advantage: bool = True


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    env_states: Any
    last_obs: jax.Array
    key: jax.Array
    update_count: jax.Array


class Hyper(NamedTuple):
    """Dynamically adjustable hyperparameters (adaptive scheduler,
    sim2real/train.py:571-586)."""

    lr: jax.Array
    ent_coef: jax.Array


def make_ppo(env: Env, network, config: PPOConfig,
             axis_name: Optional[str] = None, axis_size: int = 1):
    """Returns (init(key) -> TrainState, train_chunk(state, hyper) ->
    (state, metrics)).  ``train_chunk`` is fully jittable.

    ``axis_name`` turns the chunk into the per-shard body of a data-parallel
    learner (call inside ``shard_map`` with ``config.num_envs`` = LOCAL
    envs and ``axis_size`` = number of shards): minibatch gradients are
    ``pmean``-reduced across shards — ONE learner over all rollouts, the
    reference's SubprocVecEnv->single-PPO semantics
    (``train/train.py:63-87,117-130``) — and advantage normalisation uses
    global moments.  All per-env PRNG keys are sliced from one global
    split, so an N-shard chunk reproduces the single-device chunk on the
    concatenated batch exactly (tests/test_parallel.py)."""

    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)
    global_envs = config.num_envs * axis_size

    def _local_slice(keys):
        """Slice this shard's block out of a (global_envs, ...) key array."""
        if axis_name is None:
            return keys
        off = jax.lax.axis_index(axis_name) * config.num_envs
        return jax.lax.dynamic_slice_in_dim(keys, off, config.num_envs)

    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=1e-4),
    )

    def init(key: jax.Array) -> TrainState:
        k1, k2, k3 = jax.random.split(key, 3)
        env_states, obs = v_reset(jax.random.split(k1, config.num_envs))
        params = network.init(k2, obs[:1])
        opt_state = tx.init(params)
        return TrainState(
            params=params, opt_state=opt_state, env_states=env_states,
            last_obs=obs, key=k3, update_count=jnp.zeros((), jnp.int32),
        )

    def _rollout(state: TrainState):
        def step_fn(carry, _):
            env_states, obs, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            mean, log_std, value = network.apply(state.params, obs)
            # per-env action keys from one global split: shard-invariant
            act_keys = _local_slice(jax.random.split(k_act, global_envs))
            action = jax.vmap(
                lambda k, mu: networks.sample_action(k, mu, log_std)
            )(act_keys, mean)
            logp = networks.gaussian_logp(mean, log_std, action)
            next_states, trans = v_step(env_states, action)
            done = trans.terminated | trans.truncated
            # autoreset
            fresh_states, fresh_obs = v_reset(
                _local_slice(jax.random.split(k_reset, global_envs))
            )
            merged = jax.tree.map(
                lambda a, b: jnp.where(
                    done.reshape(done.shape + (1,) * (a.ndim - 1)), a, b
                ),
                fresh_states, next_states,
            )
            next_obs = jnp.where(done[:, None], fresh_obs, trans.obs)
            out = dict(
                obs=obs, action=action, logp=logp, value=value,
                reward=trans.reward, terminated=trans.terminated,
                done=done, bootstrap_obs=trans.obs,
            )
            return (merged, next_obs, key), out

        (env_states, last_obs, key), traj = jax.lax.scan(
            step_fn, (state.env_states, state.last_obs, state.key),
            None, length=config.n_steps,
        )
        return env_states, last_obs, key, traj

    def _compute_gae(params, traj, last_obs):
        """Reverse-scan GAE (replaces the python loop of
        sim2real/train.py:557-561).  Truncated episodes bootstrap through
        the value of the pre-reset observation."""
        _, _, last_value = network.apply(params, last_obs)
        _, _, boot_values = network.apply(params, traj["bootstrap_obs"])

        def scan_fn(carry, x):
            gae, next_value = carry
            done = x["done"]
            nv = jnp.where(
                done, jnp.where(x["terminated"], 0.0, x["boot_v"]), next_value
            )
            delta = x["reward"] + config.gamma * nv - x["value"]
            gae = delta + config.gamma * config.gae_lambda * (~done) * gae
            return (gae, x["value"]), gae

        (_, _), advantages = jax.lax.scan(
            scan_fn,
            (jnp.zeros_like(last_value), last_value),
            dict(
                reward=traj["reward"], value=traj["value"],
                terminated=traj["terminated"], done=traj["done"],
                boot_v=boot_values,
            ),
            reverse=True,
        )
        returns = advantages + traj["value"]
        return advantages, returns

    def _loss_fn(params, batch, hyper: Hyper):
        mean, log_std, value = network.apply(params, batch["obs"])
        logp = networks.gaussian_logp(mean, log_std, batch["action"])
        entropy = jnp.mean(networks.gaussian_entropy(log_std))
        adv = batch["adv"]
        if config.loss == "clip":
            ratio = jnp.exp(logp - batch["logp"])
            unclipped = ratio * adv
            clipped = jnp.clip(
                ratio, 1 - config.clip_eps, 1 + config.clip_eps
            ) * adv
            actor_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
        else:  # "plain": sim2real/train.py:567
            actor_loss = -jnp.mean(logp * adv)
        value_loss = jnp.mean(jnp.square(value - batch["ret"]))
        total = actor_loss + config.vf_coef * value_loss - hyper.ent_coef * entropy
        return total, dict(actor_loss=actor_loss, value_loss=value_loss,
                           entropy=entropy)

    def _global_mean(x):
        m = jnp.mean(x)
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
        return m

    def train_chunk(state: TrainState, hyper: Hyper):
        env_states, last_obs, key, traj = _rollout(state)
        advantages, returns = _compute_gae(state.params, traj, last_obs)
        if config.normalize_advantage:
            # global moments across shards: matches the single learner
            # normalising over the whole concatenated batch
            mu = _global_mean(advantages)
            var = _global_mean(jnp.square(advantages - mu))
            advantages = (advantages - mu) / (jnp.sqrt(var) + 1e-8)

        T, B = config.n_steps, config.num_envs
        flat = dict(
            obs=traj["obs"].reshape(T * B, -1),
            action=traj["action"].reshape(T * B, -1),
            logp=traj["logp"].reshape(T * B),
            adv=advantages.reshape(T * B),
            ret=returns.reshape(T * B),
        )
        n = T * B
        mb = min(config.minibatch_size, n)
        num_mb = n // mb

        def epoch(carry, _):
            params, opt_state, key = carry
            key, kperm = jax.random.split(key)
            perm = jax.random.permutation(kperm, n)

            def minibatch(carry, idx):
                params, opt_state = carry
                batch = jax.tree.map(lambda x: x[idx], flat)
                grads, aux = jax.grad(_loss_fn, has_aux=True)(
                    params, batch, hyper
                )
                if axis_name is not None:
                    # gradient all-reduce: every shard applies the SAME
                    # update from the global minibatch (shard-local slices
                    # of equal size -> pmean == global-batch gradient)
                    grads = jax.lax.pmean(grads, axis_name)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            idxs = perm[: num_mb * mb].reshape(num_mb, mb)
            (params, opt_state), aux = jax.lax.scan(
                minibatch, (params, opt_state), idxs
            )
            return (params, opt_state, key), aux

        opt_state = state.opt_state
        # dynamic lr without recompile (inject_hyperparams)
        opt_state[1].hyperparams["learning_rate"] = hyper.lr
        (params, opt_state, key), aux = jax.lax.scan(
            epoch, (state.params, opt_state, key), None,
            length=config.num_epochs,
        )

        ep_return_proxy = _global_mean(traj["reward"].sum(0))
        ret_mu = _global_mean(returns)
        ret_var = _global_mean(jnp.square(returns - ret_mu))
        metrics = dict(
            mean_reward=_global_mean(traj["reward"]),
            sum_reward_per_env=ep_return_proxy,
            done_rate=_global_mean(traj["done"]),
            actor_loss=_global_mean(aux["actor_loss"]),
            value_loss=_global_mean(aux["value_loss"]),
            # critic residual normalised by target variance (1 - explained
            # variance); scale-free learning signal, unlike raw value_loss
            # whose magnitude tracks the (growing) returns.
            value_resid_frac=(
                _global_mean(aux["value_loss"]) / (ret_var + 1e-8)
            ),
            entropy=_global_mean(aux["entropy"]),
            mean_value=_global_mean(traj["value"]),
        )
        new_state = TrainState(
            params=params, opt_state=opt_state, env_states=env_states,
            last_obs=last_obs, key=key,
            update_count=state.update_count + 1,
        )
        return new_state, metrics

    return init, train_chunk

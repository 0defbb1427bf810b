"""Functional environment protocol + batched autoreset vectorisation.

The reference trains through Gymnasium ``MujocoEnv`` subclasses fanned out
over worker *processes* (SB3 ``SubprocVecEnv``, ``train/train.py:63-87``).
The TPU-native replacement is a pure-functional env — ``reset(key)`` /
``step(state, action)`` over explicit pytree state — batched with ``vmap``
into thousands of on-device envs and, across chips, sharded along the batch
axis (the DP strategy of this framework; SURVEY §2.8).
"""
from __future__ import annotations

from typing import Any, Protocol, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Transition:
    obs: jax.Array
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array
    info: Any

    @property
    def done(self):
        return self.terminated | self.truncated


class Env(Protocol):
    """Single-env functional interface (implementations are thin classes
    closing over a Model; every method is jit/vmap-safe)."""

    def reset(self, key: jax.Array) -> Tuple[Any, jax.Array]:
        ...

    def step(self, state: Any, action: jax.Array) -> Tuple[Any, Transition]:
        ...


def vector_env(env: Env):
    """Batched autoreset wrappers: (reset_fn(keys), step_fn(states, actions)).

    Gymnasium-style autoreset: when an episode ends, the returned observation
    is the first observation of a fresh episode (matching SB3 VecEnv
    semantics the reference trains with).
    """
    v_reset = jax.vmap(env.reset)
    v_step = jax.vmap(env.step)

    def reset_fn(keys):
        return v_reset(keys)

    def step_fn(states, actions, keys):
        next_states, trans = v_step(states, actions)
        done = trans.terminated | trans.truncated
        fresh_states, fresh_obs = v_reset(keys)
        merged = jax.tree.map(
            lambda a, b: jnp.where(
                done.reshape(done.shape + (1,) * (a.ndim - 1)), a, b
            ),
            fresh_states,
            next_states,
        )
        obs = jnp.where(done[:, None], fresh_obs, trans.obs)
        return merged, trans.replace(obs=obs)

    return reset_fn, step_fn

"""Policy/value networks.

``MLPActorCritic`` covers all three reference configurations:
  * custom sim2real stack — 512-256 tanh MLPs with a Tanh on the action mean
    and a learned state-independent log-std (sim2real/train.py:132-149),
  * terrain stack — 1024-512 (train2.py:149-157),
  * SB3 MlpPolicy — 64-64 tanh, no squashing (train/train.py:117).
``layer_norm_extractor`` adds the reference's (unused-by-default) custom
features extractor — Linear(50) -> LayerNorm -> ReLU -> Linear(40)
(train/CurstomNetwork.py:6-17) — shared by both heads, as an SB3
features_extractor is.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPActorCritic(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (512, 256)
    squash_mean: bool = True
    log_std_init: float = float(np.log(0.4))  # INITIAL_ACTION_STD_INIT
    # CurstomNetwork.py parity: shared Linear(50)->LayerNorm->ReLU->
    # Linear(40) features extractor ahead of both heads
    layer_norm_extractor: bool = False
    extractor_dims: Tuple[int, int] = (50, 40)

    @nn.compact
    def __call__(self, obs: jax.Array):
        if self.layer_norm_extractor:
            h0, feat = self.extractor_dims
            x = nn.Dense(h0)(obs)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
            obs = nn.Dense(feat)(x)
        a = obs
        for h in self.hidden:
            a = nn.tanh(nn.Dense(h)(a))
        mean = nn.Dense(self.action_dim)(a)
        if self.squash_mean:
            mean = nn.tanh(mean)
        v = obs
        for h in self.hidden:
            v = nn.tanh(nn.Dense(h)(v))
        value = nn.Dense(1)(v)
        log_std = self.param(
            "log_std",
            lambda k, s: jnp.full(s, self.log_std_init),
            (self.action_dim,),
        )
        return mean, log_std, jnp.squeeze(value, -1)


def gaussian_logp(mean, log_std, action):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * jnp.square(action - mean) / var
        - log_std
        - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1)


def sample_action(key, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)

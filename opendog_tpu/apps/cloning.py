"""Behaviour-cloning of the analytic yaw-correction expert.

Port of ``Code/examples/cloning.py``: the expert maps yaw error to the
(N, Y) knee-lift pair exactly like the P-controller of the auto-correct walk
(cloning.py:19-31); a tiny MLP (1 -> 64 -> 64 -> 2, cloning.py:38-47) is
regression-trained on sampled errors and then drops into the walk loop in
place of the P-controller (examples/udp_walk_ai.py:42-43).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .gaits import (
    CORRECTION_GAIN_KP,
    MAX_LIFT_ANGLE,
    MIN_LIFT_ANGLE,
    NEUTRAL_LIFT_ANGLE,
)


def expert_action(yaw_error_deg):
    """Analytic expert (cloning.py:19-31): N = 30 - Kp*e, Y = 30 + Kp*e,
    clamped [20, 50]."""
    c = CORRECTION_GAIN_KP * yaw_error_deg
    n = jnp.clip(NEUTRAL_LIFT_ANGLE - c, MIN_LIFT_ANGLE, MAX_LIFT_ANGLE)
    y = jnp.clip(NEUTRAL_LIFT_ANGLE + c, MIN_LIFT_ANGLE, MAX_LIFT_ANGLE)
    return jnp.stack([n, y], axis=-1)


class WalkPolicyNet(nn.Module):
    """1 -> 64 -> 64 -> 2 (cloning.py:38-47)."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(64)(x))
        x = nn.relu(nn.Dense(64)(x))
        return nn.Dense(2)(x)


def train_cloned_policy(
    key: jax.Array,
    num_steps: int = 2000,
    batch: int = 256,
    lr: float = 1e-3,
    err_range: float = 30.0,
) -> Tuple[WalkPolicyNet, dict]:
    """Regression-train the MLP on the expert; returns (net, params)."""
    net = WalkPolicyNet()
    k1, k2 = jax.random.split(key)
    params = net.init(k1, jnp.zeros((1, 1)))
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, k):
        e = jax.random.uniform(k, (batch, 1), minval=-err_range,
                               maxval=err_range)
        target = expert_action(e[:, 0])

        def loss_fn(p):
            out = net.apply(p, e)
            return jnp.mean(jnp.square(out - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    keys = jax.random.split(k2, num_steps)
    loss = jnp.inf
    for k in keys:
        params, opt, loss = step(params, opt, k)
    return net, params


def cloned_lift_angles(net, params, yaw_error_deg: float):
    """Inference shim for the walk loop (udp_walk_ai.py:42-43)."""
    out = net.apply(params, jnp.array([[yaw_error_deg]]))
    n, y = float(out[0, 0]), float(out[0, 1])
    return (
        float(np.clip(n, MIN_LIFT_ANGLE, MAX_LIFT_ANGLE)),
        float(np.clip(y, MIN_LIFT_ANGLE, MAX_LIFT_ANGLE)),
    )

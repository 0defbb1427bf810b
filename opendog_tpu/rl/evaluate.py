"""Deterministic policy evaluation + best-model selection machinery.

The reference evaluates with an SB3 ``EvalCallback`` that periodically rolls
a dedicated eval env and saves the best model (``train/train.py:142-149``),
and with ``test/test.py:12-43`` which loads ``best_model`` for long
deterministic rollouts.  TPU-native equivalent: the whole eval episode is a
single jitted ``lax.scan`` over the functional env with the policy *mean*
action (deterministic); once an episode terminates the carry is frozen, so
the scan keeps a static shape while reporting true episode return/length.

The scan also stacks the physics states so the caller can hand them to
``utils.render.record_rollout`` — the ``VideoRecorderCallback`` analog
(``train/VideoRecorder.py:33-77``).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


def make_eval(env, net, n_steps: int):
    """Build ``eval_fn(params, key) -> (metrics, physics_states)``.

    metrics: episode_return, episode_len, forward_x (trunk x displacement
    at episode end vs start).  physics_states: State pytree with a leading
    (n_steps,) time axis (frozen after termination — replay-safe).
    """

    def eval_fn(params: Any, key: jax.Array
                ) -> Tuple[Dict[str, jax.Array], Any]:
        state, obs = env.reset(key)
        x0 = state.physics.qpos[0]

        def body(carry, _):
            state, obs, done, total_r, steps = carry
            mean, _, _ = net.apply(params, obs[None])
            nstate, trans = env.step(state, mean[0])
            # freeze every leaf once the episode has ended
            nstate = jax.tree.map(
                lambda old, new: jnp.where(done, old, new), state, nstate)
            nobs = jnp.where(done, obs, trans.obs)
            total_r = total_r + jnp.where(done, 0.0, trans.reward)
            steps = steps + jnp.where(done, 0, 1)
            done = done | trans.done
            return (nstate, nobs, done, total_r, steps), nstate.physics

        init = (state, obs, jnp.bool_(False), jnp.float32(0.0),
                jnp.int32(0))
        (state, _, done, total_r, steps), physics = jax.lax.scan(
            body, init, None, length=n_steps)
        metrics = dict(
            episode_return=total_r,
            episode_len=steps,
            forward_x=state.physics.qpos[0] - x0,
            terminated=done,
        )
        return metrics, physics

    return eval_fn

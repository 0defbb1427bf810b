"""Shared reward/cost primitives — pure functions with explicit carried state.

Functional re-design of the reference's mutable reward-calculator objects
(``Code/mujoco/rewards/walk_environment_reward_calc.py`` and friends): every
stateful mechanism (diagonal-gait pattern machine, feet-air-time filter)
becomes a (state, inputs) -> (reward, state') transition that lives in the
environment's scan carry.  All functions are scalar-per-env and batched with
``vmap``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..physics import spatial


@struct.dataclass
class GaitState:
    """Carried state of the stateful gait rewards
    (walk_environment_reward_calc.py:54-69,91-92,236-255)."""

    pattern_index: jax.Array  # () int32
    consecutive_matches: jax.Array  # () int32
    feet_air_time: jax.Array  # (4,) float
    last_contacts: jax.Array  # (4,) bool

    @staticmethod
    def init(dtype=jnp.float32) -> "GaitState":
        return GaitState(
            pattern_index=jnp.zeros((), jnp.int32),
            consecutive_matches=jnp.zeros((), jnp.int32),
            feet_air_time=jnp.zeros(4, dtype),
            last_contacts=jnp.zeros(4, bool),
        )


def diagonal_gait_reward(
    gait: GaitState,
    feet_contact: jax.Array,  # (4,) bool — [FL, FR, BL, BR] order
    forward_vel: jax.Array,
    patterns: np.ndarray,  # (P, 4) static expected-contact table
    min_vel: float = 0.5,
):
    """Pattern-machine gait reward (walk_environment_reward_calc.py:203-234).

    Matching the expected contact pattern while moving at >= ``min_vel``
    advances the machine and pays ``consecutive_matches`` (incremented by
    ``len(patterns)`` per match); any miss resets.  Returns (reward, gait').
    """
    P = patterns.shape[0]
    expected = jnp.asarray(patterns, bool)[gait.pattern_index]
    matches = jnp.all(feet_contact == expected) & (forward_vel >= min_vel)
    new_consecutive = jnp.where(matches, gait.consecutive_matches + P, 0)
    reward = jnp.where(matches, new_consecutive, 0).astype(jnp.float32)
    new_index = jnp.where(matches, (gait.pattern_index + 1) % P, 0)
    return reward, gait.replace(
        pattern_index=new_index.astype(jnp.int32),
        consecutive_matches=new_consecutive.astype(jnp.int32),
    )


def feet_air_time_reward(
    gait: GaitState,
    feet_force_norm: jax.Array,  # (4,)
    dt: float,
    desired_vel_xy: jax.Array,  # (2,)
):
    """Air-time reward with contact filtering
    (walk_environment_reward_calc.py:236-255)."""
    curr_contact = feet_force_norm > 1.0
    contact_filter = curr_contact | gait.last_contacts
    first_contact = (gait.feet_air_time > 0.0) * contact_filter
    air_time = gait.feet_air_time + dt
    reward = jnp.sum((air_time - 1.0) * first_contact)
    reward = reward * (jnp.linalg.norm(desired_vel_xy) > 0.1)
    air_time = air_time * (~contact_filter)
    return reward, gait.replace(
        feet_air_time=air_time, last_contacts=curr_contact
    )


# ---------------------------------------------------------------------------
# stateless pieces
# ---------------------------------------------------------------------------


def linear_velocity_tracking(
    desired_vel_xy: jax.Array, vel_xy: jax.Array, pos_x: jax.Array,
    sigma: float = 0.25,
):
    """exp-kernel tracking, zeroed behind the start line
    (walk_environment_reward_calc.py:169-176)."""
    err = jnp.sum(jnp.square(desired_vel_xy - vel_xy))
    return jnp.where(pos_x > 0, jnp.exp(-err / sigma), 0.0)


def angular_velocity_tracking(
    desired_yaw_rate: jax.Array, yaw_rate: jax.Array, sigma: float = 0.25
):
    return jnp.exp(-jnp.square(desired_yaw_rate - yaw_rate) / sigma)


def safe_range_reward(
    quat: jax.Array,
    roll_range: float = np.deg2rad(15),
    pitch_range: float = np.deg2rad(15),
    yaw_range: float = np.deg2rad(15),
    z_top: float = 0.110,
):
    """Orientation margin reward (walk_environment_reward_calc.py:140-154)."""
    roll, pitch, yaw = spatial.euler_from_quat(quat)
    d_r = jnp.where(jnp.abs(roll) > roll_range, 0.0, roll_range - jnp.abs(roll))
    d_p = jnp.where(jnp.abs(pitch) > pitch_range, 0.0, pitch_range - jnp.abs(pitch))
    d_y = jnp.where(jnp.abs(yaw) > yaw_range, 0.0, yaw_range - jnp.abs(yaw))
    max_d = z_top + roll_range + pitch_range + yaw_range
    return (d_r + d_p + d_y) / max_d


def is_healthy(
    quat: jax.Array,
    state_vec: jax.Array,
    roll_range: float = np.deg2rad(15),
    pitch_range: float = np.deg2rad(15),
    yaw_range: float = np.deg2rad(15),
):
    """Orientation health band (walk_environment_reward_calc.py:117-135)."""
    roll, pitch, yaw = spatial.euler_from_quat(quat)
    finite = jnp.all(jnp.isfinite(state_vec))
    return (
        finite
        & (jnp.abs(roll) < roll_range)
        & (jnp.abs(pitch) < pitch_range)
        & (jnp.abs(yaw) < yaw_range)
    )


def projected_gravity(quat: jax.Array, gravity=np.array([0.0, 0, -9.81])):
    """Reference's idiosyncratic projected-gravity observation — a projection
    of the gravity vector onto the *euler-angle vector* (sic), normalised
    (walk_environment_reward_calc.py:156-166).  Reproduced exactly because it
    feeds trained-policy observations."""
    roll, pitch, yaw = spatial.euler_from_quat(quat)
    euler = jnp.stack([roll, pitch, yaw])
    p = jnp.dot(jnp.asarray(gravity, dtype=euler.dtype), euler) * euler
    n = jnp.linalg.norm(p)
    return jnp.where(n == 0, p, p / jnp.maximum(n, 1e-12))


def default_joint_position_cost(joint_pos, default_pos):
    return jnp.sum(jnp.square(joint_pos - default_pos))


def action_rate_cost(last_action, action):
    return jnp.sum(jnp.square(last_action - action))


def torque_cost(torques):
    return jnp.sum(jnp.square(torques))


def joint_limit_cost(joint_pos, soft_range):
    below = jnp.clip(soft_range[:, 0] - joint_pos, min=0.0)
    above = jnp.clip(joint_pos - soft_range[:, 1], min=0.0)
    return jnp.sum(below + above)


def soft_joint_range(ctrlrange: np.ndarray, multiplier: float = 0.9,
                     scale: float = 0.1) -> np.ndarray:
    """Soft joint range used by the limit cost
    (walk_environment_reward_calc.py:96-100: offset = 0.1*(1-0.9)*span)."""
    offset = scale * (1 - multiplier) * (ctrlrange[:, 1] - ctrlrange[:, 0])
    out = np.array(ctrlrange, dtype=np.float64)
    out[:, 0] += offset
    out[:, 1] -= offset
    return out


def sample_desired_vel(key, vmin, vmax):
    return jax.random.uniform(
        key, (3,), minval=jnp.asarray(vmin, jnp.float32),
        maxval=jnp.asarray(vmax, jnp.float32)
    )

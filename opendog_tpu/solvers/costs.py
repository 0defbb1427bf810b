"""Task cost functions for the trajectory-optimization solvers.

Costs are pure per-step functions ``cost(model, state, ctrl, aux) -> scalar``
composed by the solvers over horizons.  They mirror the reference's task
objectives (velocity tracking / orientation health / gait shaping from
``rewards/walk_environment_reward_calc.py`` and the dense shaping of
``sim2real/train.py:313-392``) recast as costs for MPC.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..physics import spatial


class TrackingCostParams(NamedTuple):
    """Quadratic-ish locomotion cost: track a commanded body velocity while
    staying upright at a target height near the home posture."""

    desired_vel_xy: tuple = (0.5, 0.0)
    desired_yaw_rate: float = 0.0
    target_height: float = 0.265  # Go1 standing height; OpenDOG uses 0.069
    w_vel: float = 10.0
    w_yaw_rate: float = 1.0
    w_height: float = 50.0
    w_upright: float = 20.0
    w_joint_posture: float = 1.0
    w_ctrl_rate: float = 0.5
    w_lateral: float = 2.0


def tracking_cost(model, params: TrackingCostParams, home_joint_qpos):
    """Returns step_cost(qpos, qvel, ctrl, prev_ctrl) for velocity-tracking
    locomotion MPC."""
    desired = jnp.asarray(params.desired_vel_xy, jnp.float32)
    home_j = jnp.asarray(home_joint_qpos, jnp.float32)

    def step_cost(qpos, qvel, ctrl, prev_ctrl):
        quat = qpos[3:7]
        roll, pitch, _yaw = spatial.euler_from_quat(quat)
        c_vel = params.w_vel * jnp.sum(jnp.square(qvel[:2] - desired))
        c_yaw = params.w_yaw_rate * jnp.square(qvel[5] - params.desired_yaw_rate)
        c_h = params.w_height * jnp.square(qpos[2] - params.target_height)
        c_up = params.w_upright * (jnp.square(roll) + jnp.square(pitch))
        c_post = params.w_joint_posture * jnp.sum(
            jnp.square(qpos[7:] - home_j)
        )
        c_rate = params.w_ctrl_rate * jnp.sum(jnp.square(ctrl - prev_ctrl))
        c_lat = params.w_lateral * jnp.square(qvel[1])
        return c_vel + c_yaw + c_h + c_up + c_post + c_rate + c_lat

    return step_cost


def standing_cost(model, target_height: float, home_joint_qpos):
    """Balance-in-place cost (BASELINE config 1)."""
    p = TrackingCostParams(
        desired_vel_xy=(0.0, 0.0), target_height=target_height,
        w_vel=20.0, w_height=100.0, w_upright=50.0, w_joint_posture=2.0,
    )
    return tracking_cost(model, p, home_joint_qpos)

"""Task cost functions for the trajectory-optimization solvers.

Costs are pure per-step functions ``cost(state, ctrl, prev_ctrl) -> scalar``
(``state`` is the physics :class:`State`, so phase-based gait references can
use ``state.time``) composed by the solvers over horizons.  They mirror the
reference's task objectives (velocity tracking / orientation health / gait
shaping from ``rewards/walk_environment_reward_calc.py`` and the
phase-conditioned symmetric gait of ``sim2real/train.py:235-285``) recast as
costs for MPC.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..physics import State, spatial


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
    """Returns step_cost(state, ctrl, prev_ctrl) for velocity-tracking
    locomotion MPC."""
    desired = jnp.asarray(params.desired_vel_xy, jnp.float32)
    home_j = jnp.asarray(home_joint_qpos, jnp.float32)

    def step_cost(state: State, ctrl, prev_ctrl):
        qpos, qvel = state.qpos, state.qvel
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


class TrotCostParams(NamedTuple):
    """Phase-referenced diagonal trot (the MPC analog of the reference's
    phase-conditioned symmetric gait, sim2real/train.py:235-285, and the
    scripted trot deltas of sim2real/main.py:68-76)."""

    desired_vel_xy: tuple = (0.5, 0.0)
    target_height: float = 0.265
    period_s: float = 0.4
    thigh_amp: float = 0.2       # fore-aft swing amplitude [rad]
    knee_lift: float = 0.35      # swing-leg knee flexion [rad]
    w_gait: float = 8.0
    w_vel: float = 12.0
    w_height: float = 60.0
    w_upright: float = 30.0
    w_lateral: float = 3.0
    w_yaw_rate: float = 2.0
    w_heading: float = 6.0     # hold world heading (prevents the
                               # turned-around backward-trot attractor)
    desired_yaw: float = 0.0   # heading target [rad] — nonzero turns
                               # while trotting (the TurnEnvironment task)
    w_ctrl_rate: float = 0.3
    thigh_phase: float = 1.0   # +1: swing-leg thigh rotates forward with s


def trot_cost(model, params: TrotCostParams, home_joint_qpos,
              legs: str = "go1"):
    """Gait-shaped locomotion cost.

    Joint layout per leg: 'go1' = (hip, thigh, knee) x [FR, FL, RR, RL];
    'opendog' = (thigh, knee) x [FL, FR, BL, BR] (qpos order).  Diagonal
    pairs (FR+RL / FL+RR, or FR+BL / FL+BR) alternate by phase."""
    home_j = jnp.asarray(home_joint_qpos, jnp.float32)
    desired = jnp.asarray(params.desired_vel_xy, jnp.float32)
    if legs == "go1":
        nlegs, per = 4, 3
        thigh_idx = np.array([1, 4, 7, 10])
        knee_idx = np.array([2, 5, 8, 11])
        # legs order FR, FL, RR, RL -> diagonal pair A = FR, RL
        diag_sign = np.array([1.0, -1.0, -1.0, 1.0])
        knee_dir = -1.0  # knees flex negative
        thigh_dir = -params.thigh_phase  # go1 thigh angle decreases forward
    else:  # opendog: FL, FR, BL, BR thigh/knee pairs
        nlegs, per = 4, 2
        thigh_idx = np.array([0, 2, 4, 6])
        knee_idx = np.array([1, 3, 5, 7])
        diag_sign = np.array([-1.0, 1.0, 1.0, -1.0])  # pair A = FR, BL
        knee_dir = -1.0
        thigh_dir = params.thigh_phase

    def step_cost(state: State, ctrl, prev_ctrl):
        qpos, qvel = state.qpos, state.qvel
        quat = qpos[3:7]
        roll, pitch, yaw = spatial.euler_from_quat(quat)
        phase = 2.0 * jnp.pi * state.time / params.period_s
        s = jnp.sin(phase)
        swingA = jnp.maximum(s, 0.0)   # pair A in swing
        swingB = jnp.maximum(-s, 0.0)
        swing = jnp.where(jnp.asarray(diag_sign) > 0, swingA, swingB)
        thigh_ref = home_j[thigh_idx] + thigh_dir * params.thigh_amp \
            * jnp.asarray(diag_sign) * s
        knee_ref = home_j[knee_idx] + knee_dir * params.knee_lift * swing
        joints = qpos[7:]
        c_gait = params.w_gait * (
            jnp.sum(jnp.square(joints[thigh_idx] - thigh_ref))
            + jnp.sum(jnp.square(joints[knee_idx] - knee_ref))
        )
        c_vel = params.w_vel * jnp.sum(jnp.square(qvel[:2] - desired))
        c_h = params.w_height * jnp.square(qpos[2] - params.target_height)
        c_up = params.w_upright * (jnp.square(roll) + jnp.square(pitch))
        c_lat = params.w_lateral * jnp.square(qvel[1])
        c_yawr = params.w_yaw_rate * jnp.square(qvel[5])
        dyaw = jnp.arctan2(jnp.sin(yaw - params.desired_yaw),
                           jnp.cos(yaw - params.desired_yaw))
        c_head = params.w_heading * jnp.square(dyaw)
        c_rate = params.w_ctrl_rate * jnp.sum(jnp.square(ctrl - prev_ctrl))
        return (c_gait + c_vel + c_h + c_up + c_lat + c_yawr + c_head
                + c_rate)

    return step_cost


def trot_gait_ref(model, params: TrotCostParams, home_joint_qpos,
                  legs: str = "go1"):
    """Phase-referenced trot joint targets in ACTUATOR order — the
    feed-forward gait the trot cost pulls toward (same thigh/knee reference
    formulas as ``trot_cost``).  Used as the residual base for MPC->policy
    distillation (the student learns expert - u_ref, the same decomposition
    as the reference's phase-conditioned symmetric policy around its stand
    pose, sim2real/train.py:235-285) and for open-loop gait playback."""
    home_j = jnp.asarray(home_joint_qpos, jnp.float32)
    if legs == "go1":
        thigh_idx = np.array([1, 4, 7, 10])
        knee_idx = np.array([2, 5, 8, 11])
        diag_sign = np.array([1.0, -1.0, -1.0, 1.0])
        knee_dir = -1.0
        thigh_dir = -params.thigh_phase
    else:
        thigh_idx = np.array([0, 2, 4, 6])
        knee_idx = np.array([1, 3, 5, 7])
        diag_sign = np.array([-1.0, 1.0, 1.0, -1.0])
        knee_dir = -1.0
        thigh_dir = params.thigh_phase
    qadr = np.asarray(model.actuator_qposadr) - 7  # actuator -> joint index
    sign = jnp.asarray(diag_sign)

    def u_ref(t):
        phase = 2.0 * jnp.pi * t / params.period_s
        s = jnp.sin(phase)
        swing = jnp.where(sign > 0, jnp.maximum(s, 0.0),
                          jnp.maximum(-s, 0.0))
        joints_ref = home_j
        joints_ref = joints_ref.at[thigh_idx].set(
            home_j[thigh_idx] + thigh_dir * params.thigh_amp * sign * s)
        joints_ref = joints_ref.at[knee_idx].set(
            home_j[knee_idx] + knee_dir * params.knee_lift * swing)
        return joints_ref[qadr]

    return u_ref

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
    lift_phase: float = 0.0    # knee-lift oscillator phase lead [rad].
    # 0 = lift in phase with thigh POSITION (legacy; measured to drag the
    # foot through the swing -> open-loop marching slips BACKWARD on go1,
    # see docs/PARITY.md).  pi/2 = QUADRATURE: the foot lifts while the
    # thigh TRANSITIONS (velocity max) — open-loop forward walk whose
    # speed scales with thigh_amp (go1: amp 0.2 -> 0.52 m/s, 0.3 ->
    # 0.86 m/s, measured on the fused-kernel plant).
    amp_v0: float = -1.0       # calibrated speed->amplitude law offset.
    # < 0 (default) keeps the legacy LINEAR command scale
    # (speed / |desired_vel_xy|), which under-strides slow commands: the
    # measured open-loop law on go1 (quadrature lift) is
    # v = 3.4*amp - 0.16, i.e. amplitude has a nonzero-speed intercept.
    # >= 0 enables scale = clip((v + amp_v0) / (v_nom + amp_v0), 0, 1.5)
    # * min(v / 0.1, 1) — affine law matching the measurement (amp_v0 =
    # 0.16), with the second factor gating smoothly to an exact stand.
    amp_knots: tuple = ()      # measured piecewise-linear speed->scale
    # law: ((v0, s0), (v1, s1), ...) pairs from
    # scripts/calibrate_cmd_gait.py, measured OPEN LOOP on the SAME
    # plant engine the policy runs on (the r4 opendog failure: a law
    # calibrated on the op-graph plant under-drives the pallas plant by
    # ~2x).  Non-empty overrides amp_v0/linear scaling:
    # scale = interp(speed, v_knots, s_knots), clamped at the last knot
    # (commanding beyond the gait's measured top speed saturates the
    # stride instead of over-striding, which the calibration shows
    # SLOWS this robot).  First knot (0, 0) gives the exact-stand gate.
    turn_gain: float = 0.0     # differential-stride steering gain.
    # > 0 adds a per-side stride asymmetry d = clip(turn_gain * dyaw,
    # -0.5, 0.5): legs on the turn's inside stride less (backwards at a
    # stand), the outside more — differential drive.  The COST computes
    # dyaw from the actual yaw (wrap(yaw_target - yaw): steering fades as
    # the heading closes); the open-loop u_ref uses dyaw = yaw_target
    # (it cannot see the state — the residual learns to cancel it).


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
        sl = jnp.sin(phase + params.lift_phase)
        swingA = jnp.maximum(sl, 0.0)   # pair A in swing
        swingB = jnp.maximum(-sl, 0.0)
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


def trot_cost_cmd(model, params: TrotCostParams, home_joint_qpos,
                  legs: str = "go1"):
    """Command-conditioned :func:`trot_cost`: returns
    ``step_cost(state, ctrl, prev_ctrl, cmd)`` with ``cmd = (vx, vy,
    yaw_target)`` replacing the params' fixed ``desired_vel_xy`` /
    ``desired_yaw`` at runtime.  Built for command-randomized MPC experts
    (``mppi.make_solver(with_command=True)``) — the MPC analog of the
    reference's per-reset randomized desired velocity
    (environments/WalkEnvironment.py:138-151).

    The gait-shaping term scales with commanded speed: at ``cmd = 0`` the
    thigh swing amplitude collapses (stand, don't march) while the knee
    rhythm fades with it."""
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
    sign = jnp.asarray(diag_sign)
    v_nom = max(1e-6, float(np.hypot(*params.desired_vel_xy)))

    side = _side_signs(legs)

    def step_cost(state: State, ctrl, prev_ctrl, cmd):
        qpos, qvel = state.qpos, state.qvel
        roll, pitch, yaw = spatial.euler_from_quat(qpos[3:7])
        # per-leg gait amplitude: commanded-speed scale (0 -> stand) plus
        # the differential-steering asymmetry (turn_gain, closes on the
        # ACTUAL heading error here)
        s_leg = _cmd_stride_scales(params, v_nom, side, cmd, yaw)
        phase = 2.0 * jnp.pi * state.time / params.period_s
        s = jnp.sin(phase)
        sl = jnp.sin(phase + params.lift_phase)
        swing = jnp.where(sign > 0, jnp.maximum(sl, 0.0),
                          jnp.maximum(-sl, 0.0))
        thigh_ref = home_j[thigh_idx] + thigh_dir * params.thigh_amp \
            * s_leg * sign * s
        knee_ref = home_j[knee_idx] \
            + knee_dir * params.knee_lift * jnp.abs(s_leg) * swing
        joints = qpos[7:]
        c_gait = params.w_gait * (
            jnp.sum(jnp.square(joints[thigh_idx] - thigh_ref))
            + jnp.sum(jnp.square(joints[knee_idx] - knee_ref))
        )
        c_vel = params.w_vel * jnp.sum(jnp.square(qvel[:2] - cmd[:2]))
        c_h = params.w_height * jnp.square(qpos[2] - params.target_height)
        c_up = params.w_upright * (jnp.square(roll) + jnp.square(pitch))
        c_lat = params.w_lateral * jnp.square(qvel[1] - cmd[1])
        c_yawr = params.w_yaw_rate * jnp.square(qvel[5])
        dyaw = jnp.arctan2(jnp.sin(yaw - cmd[2]), jnp.cos(yaw - cmd[2]))
        c_head = params.w_heading * jnp.square(dyaw)
        c_rate = params.w_ctrl_rate * jnp.sum(jnp.square(ctrl - prev_ctrl))
        return (c_gait + c_vel + c_h + c_up + c_lat + c_yawr + c_head
                + c_rate)

    return step_cost


def ref_takes_cmd(u_ref_fn) -> bool:
    """True if an action reference is command-indexed — ``(t, cmd) ->
    (nu,)`` (e.g. :func:`trot_gait_ref_cmd`) rather than ``(t) -> (nu,)``
    (:func:`trot_gait_ref`).  THE one arity convention shared by the
    anchored solver (mppi.make_solver), the distiller (rl/distill.py) and
    student deployment (rl/distill_zoo.load_student)."""
    import inspect

    return len(inspect.signature(u_ref_fn).parameters) >= 2


def _cmd_stride_scales(params: TrotCostParams, v_nom: float, side,
                       cmd, yaw=None):
    """(4,) per-leg stride scales for the command-conditioned gait.

    Forward component: the legacy linear command scale, or (``amp_v0 >=
    0``) the calibrated affine amp law with a smooth stand gate.
    Steering component (``turn_gain > 0``): differential stride ``side *
    d`` — at a stand the legs stride in opposition and the robot turns in
    place.  ``yaw=None`` is the open-loop (u_ref) form: the heading error
    is taken as the commanded target itself."""
    speed = jnp.sqrt(jnp.sum(jnp.square(cmd[:2])) + 1e-12)
    if len(params.amp_knots) > 0:
        kv = jnp.asarray([k[0] for k in params.amp_knots], jnp.float32)
        ks = jnp.asarray([k[1] for k in params.amp_knots], jnp.float32)
        scale = jnp.interp(speed, kv, ks)
    elif params.amp_v0 >= 0.0:
        scale = jnp.clip((speed + params.amp_v0)
                         / (v_nom + params.amp_v0), 0.0, 1.5) \
            * jnp.minimum(speed / 0.1, 1.0)
    else:
        scale = jnp.clip(speed / v_nom, 0.0, 1.5)
    s_leg = scale * jnp.ones_like(side)
    if params.turn_gain > 0.0:
        dyaw = (cmd[2] if yaw is None else
                jnp.arctan2(jnp.sin(cmd[2] - yaw), jnp.cos(cmd[2] - yaw)))
        d = jnp.clip(params.turn_gain * dyaw, -0.5, 0.5)
        s_leg = s_leg + side * d
    return s_leg


def _side_signs(legs: str):
    """+1 for legs on the robot's RIGHT (y < 0), -1 for LEFT: a positive
    differential strides the right side longer -> turns LEFT (+yaw)."""
    if legs == "go1":       # FR, FL, RR, RL
        return jnp.asarray([1.0, -1.0, 1.0, -1.0])
    return jnp.asarray([-1.0, 1.0, -1.0, 1.0])  # opendog: FL, FR, BL, BR


def trot_gait_ref_cmd(model, params: TrotCostParams, home_joint_qpos,
                      legs: str = "go1"):
    """Command-scaled :func:`trot_gait_ref`: ``u_ref(t, cmd)`` with the
    swing amplitude scaled by commanded speed exactly as
    :func:`trot_cost_cmd` scales its gait term (cmd = 0 -> the home stand).
    Used as the residual base for command-conditioned distillation so the
    student's regression target stays small across the whole command
    family."""
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
    qadr = np.asarray(model.actuator_qposadr) - 7
    sign = jnp.asarray(diag_sign)
    v_nom = max(1e-6, float(np.hypot(*params.desired_vel_xy)))

    side = _side_signs(legs)

    def u_ref(t, cmd):
        s_leg = _cmd_stride_scales(params, v_nom, side, cmd, yaw=None)
        phase = 2.0 * jnp.pi * t / params.period_s
        s = jnp.sin(phase)
        sl = jnp.sin(phase + params.lift_phase)
        swing = jnp.where(sign > 0, jnp.maximum(sl, 0.0),
                          jnp.maximum(-sl, 0.0))
        joints_ref = home_j
        joints_ref = joints_ref.at[thigh_idx].set(
            home_j[thigh_idx]
            + thigh_dir * params.thigh_amp * s_leg * sign * s)
        joints_ref = joints_ref.at[knee_idx].set(
            home_j[knee_idx]
            + knee_dir * params.knee_lift * jnp.abs(s_leg) * swing)
        return joints_ref[qadr]

    return u_ref


class ContactSchedule(NamedTuple):
    """Explicit per-leg stance/swing plan — the contact-sequencing input of
    the whole-body iLQR (BASELINE config 3, "iLQR MPC with contact
    schedule").  The schedule is a table of time slots; costs built from it
    are phase-indexed via ``state.time``, which iLQR threads through the
    horizon (solvers/ilqr.py stage times), so one solve optimises through
    the full stance/swing sequence.

    ``stance``: (n_slots, nlegs) rows of 0/1 — 1 = leg planned in stance
    during that slot.  Leg order follows the model's qpos leg order
    (go1: FR, FL, RR, RL; opendog: FL, FR, BL, BR).
    ``thigh_offset``: optional (n_slots, nlegs) thigh targets [rad,
    "forward" units] AT THE START of each slot; references interpolate
    linearly to the next slot's value (triangle-wave gait trajectories).
    ``cyclic``: wrap for gaits; clamp at the last slot for terminal
    sequences (landing: flight -> front touch-down -> all-stance, matching
    the reference's phase semantics,
    rewards/landing_environment_reward_calc.py:107-135).
    """

    stance: tuple
    slot_dt: float
    cyclic: bool = True
    thigh_offset: tuple = None


def trot_schedule(params: TrotCostParams, legs: str = "go1",
                  duty: float = 0.5) -> ContactSchedule:
    """Alternating-diagonal trot schedule: pair A (FR+RL / FR+BL) in
    stance while pair B swings, then swap.  Thigh offsets give each leg a
    triangle-wave fore-aft swing of amplitude ``thigh_amp`` (forward
    during swing, back during stance — the propulsive stroke).

    ``duty`` is the stance fraction per leg:

    * 0.5 (default) — the classic two-slot trot: one diagonal pair is
      always airborne.
    * 0.625 — WALK-TROT with quadruple-support overlap: an 8-slot cycle
      (swing = 3 slots = 3/8 period, stance = 5/8) where each diagonal
      pair's touch-down overlaps the other pair's stance — the trunk is
      carried by all four legs 25% of the time (phase semantics as
      landing_environment_reward_calc.py:107-135's front-then-back
      weight transfer, generalized to a cyclic gait).  HONEST status:
      explored as a stability-margin candidate for the r4 crouched-march
      failure, but measured WORSE than the trot under the old tracker
      (quad support holds the two pairs at different thigh offsets — a
      leg-length conflict the solver resolves by crouching: go1 z ~0.07
      at w_height 60, 0.11 at 120, vs the trot's healthy 0.19-0.25).
      The actual r4 fix was plan-integration rate + warm start (see
      make_ilqr_tracker).  Kept as the schedule-expressiveness example
      and for low-speed gaits where the offset conflict is small."""
    if legs == "go1":
        diag_sign = np.array([1.0, -1.0, -1.0, 1.0])  # FR, FL, RR, RL
    else:
        diag_sign = np.array([-1.0, 1.0, 1.0, -1.0])  # FL, FR, BL, BR
    amp = params.thigh_amp
    try:
        n_slots, n_swing = {0.5: (2, 1), 0.625: (8, 3)}[duty]
    except KeyError:
        raise ValueError(f"duty must be 0.5 or 0.625, got {duty}")
    # per-leg triangle wave (slot-START waypoints): sweep -amp -> +amp
    # over the n_swing swing slots, stroke back over the stance slots.
    # Pair B runs the same cycle half a period later.
    tri = np.array([
        (-amp + 2.0 * amp * k / n_swing) if k <= n_swing
        else (amp - 2.0 * amp * (k - n_swing) / (n_slots - n_swing))
        for k in range(n_slots)], np.float32)
    phase = np.where(diag_sign > 0, 0, n_slots // 2)
    off = np.stack([tri[(k - phase) % n_slots] for k in range(n_slots)])
    stance = np.stack([((k - phase) % n_slots >= n_swing)
                       .astype(np.float32) for k in range(n_slots)])
    return ContactSchedule(
        stance=tuple(map(tuple, stance)),
        slot_dt=params.period_s / n_slots,
        cyclic=True,
        thigh_offset=tuple(map(tuple, off.astype(np.float32))),
    )


def landing_schedule(slot_dt: float = 0.25) -> ContactSchedule:
    """Front-then-back landing sequence for the Go1 ``descent`` drop
    (reference phases: front feet touch first, then weight onto all four,
    landing_environment_reward_calc.py:107-135).  Leg order FR, FL, RR,
    RL.  The FRONT legs are planned in stance from the first slot — they
    REACH for the ground during flight while the rears stay tucked one
    slot longer; an all-swing flight slot measures as simultaneous
    touchdown because no leg reaches (landing-config sweep, 2026-08-19:
    this table + slot_dt 0.25 / knee_lift 0.5 / w_gait 20 / w_upright 60
    lands ordered 0.24/0.24 vs 0.26/0.26 s AND upright z=0.269,
    quat_w=0.987)."""
    stance = ((1.0, 1.0, 0.0, 0.0),   # flight: fronts reach, rears tuck
              (1.0, 1.0, 0.0, 0.0),   # front touch-down
              (1.0, 1.0, 1.0, 1.0))   # all-stance
    return ContactSchedule(stance=stance, slot_dt=slot_dt, cyclic=False)


def contact_schedule_cost(model, sched: ContactSchedule,
                          params: TrotCostParams, home_joint_qpos,
                          legs: str = "go1", w_stance_vel: float = 0.05):
    """Cost shaped by an explicit :class:`ContactSchedule`.

    Per-leg, per-time references from the schedule (linearly interpolated
    between slots): swing legs flex the knee by ``knee_lift`` and follow
    the slot thigh offsets; stance legs extend to home and are damped
    (``w_stance_vel`` on their joint velocities — a smooth stand-in for
    the complementarity condition "stance foot does not move").  Trunk
    terms (velocity/height/upright/heading) reuse ``TrotCostParams``.
    """
    home_j = jnp.asarray(home_joint_qpos, jnp.float32)
    desired = jnp.asarray(params.desired_vel_xy, jnp.float32)
    if legs == "go1":
        thigh_idx = np.array([1, 4, 7, 10])
        knee_idx = np.array([2, 5, 8, 11])
        knee_dir = -1.0
        thigh_dir = -params.thigh_phase
    else:
        thigh_idx = np.array([0, 2, 4, 6])
        knee_idx = np.array([1, 3, 5, 7])
        knee_dir = -1.0
        thigh_dir = params.thigh_phase
    stance_tab = jnp.asarray(sched.stance, jnp.float32)
    n_slots = stance_tab.shape[0]
    off_tab = (jnp.asarray(sched.thigh_offset, jnp.float32)
               if sched.thigh_offset is not None
               else jnp.zeros_like(stance_tab))
    # dof index of each scheduled joint (free joint -> qvel[6:])
    thigh_dof = thigh_idx + 6
    knee_dof = knee_idx + 6

    def _interp(table, pos):
        """Linear interpolation of table rows at fractional slot position
        ``pos`` (row k anchored at pos == k)."""
        if sched.cyclic:
            pos = jnp.mod(pos, n_slots)
            i0 = jnp.floor(pos).astype(jnp.int32) % n_slots
            i1 = (i0 + 1) % n_slots
            frac = pos - jnp.floor(pos)
        else:
            pos = jnp.clip(pos, 0.0, float(n_slots - 1))
            i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_slots - 1)
            i1 = jnp.minimum(i0 + 1, n_slots - 1)
            frac = pos - jnp.floor(pos)
        return (1 - frac) * table[i0] + frac * table[i1]

    def refs(t):
        pos = t / sched.slot_dt
        # stance flags anchor at slot CENTERS: the schedule holds crisply
        # mid-slot and blends smoothly across slot boundaries (start-
        # anchored interpolation would wash stance to 0.5 exactly when the
        # leg is most definitely planted)
        stance_t = _interp(stance_tab, pos - 0.5)
        # thigh offsets are slot-START waypoints (triangle-wave gait:
        # swing leg travels -amp -> +amp across its swing slot)
        off_t = _interp(off_tab, pos)
        return stance_t, off_t

    def step_cost(state: State, ctrl, prev_ctrl):
        qpos, qvel = state.qpos, state.qvel
        roll, pitch, yaw = spatial.euler_from_quat(qpos[3:7])
        stance_t, off_t = refs(state.time)
        swing_t = 1.0 - stance_t
        joints = qpos[7:]
        thigh_ref = home_j[thigh_idx] + thigh_dir * off_t
        knee_ref = home_j[knee_idx] + knee_dir * params.knee_lift * swing_t
        c_gait = params.w_gait * (
            jnp.sum(jnp.square(joints[thigh_idx] - thigh_ref))
            + jnp.sum(jnp.square(joints[knee_idx] - knee_ref))
        )
        # stance legs should be quiet: scheduled-complementarity penalty
        c_stance = w_stance_vel * jnp.sum(
            stance_t * (jnp.square(qvel[thigh_dof])
                        + jnp.square(qvel[knee_dof]))
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
        return (c_gait + c_stance + c_vel + c_h + c_up + c_lat + c_yawr
                + c_head + c_rate)

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
        sl = jnp.sin(phase + params.lift_phase)
        swing = jnp.where(sign > 0, jnp.maximum(sl, 0.0),
                          jnp.maximum(-sl, 0.0))
        joints_ref = home_j
        joints_ref = joints_ref.at[thigh_idx].set(
            home_j[thigh_idx] + thigh_dir * params.thigh_amp * sign * s)
        joints_ref = joints_ref.at[knee_idx].set(
            home_j[knee_idx] + knee_dir * params.knee_lift * swing)
        return joints_ref[qadr]

    return u_ref

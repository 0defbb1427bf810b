"""Canonical trot-distillation setups for the built-in robots.

One place for the (cost, gait reference, observation, network) recipe the
walking-student proof uses (scripts/distill_walk.py), so tests and apps
can rebuild the exact policy around a saved ``student.msgpack``.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..assets import load_go1, load_opendog
from ..solvers import MPPIConfig, costs
from .networks import MLPActorCritic


class TrotDistillSetup(NamedTuple):
    model: object
    cost: object
    u_ref: object          # (time,) -> (nu,) gait reference
    obs_fn: object         # (qpos, qvel, time) -> obs (phase included)
    net: MLPActorCritic
    mppi_config: MPPIConfig
    z_band: tuple          # healthy trunk-height band
    # JSON-serializable fingerprint of the effective gait/cost recipe.  A
    # saved student.msgpack deploys as ``net(obs) + u_ref`` — it is only
    # valid with the u_ref it was trained against, so committed artifacts
    # carry this in metrics.json and a test pins it against the current
    # zoo defaults (a silent default change would otherwise offset every
    # deployed action).
    recipe: dict = None


def _jsonable(v):
    """Recipe values in their json round-trip form (tuples -> lists,
    recursively) so artifact-recorded recipes compare equal to zoo
    defaults after json load (amp_knots is a tuple of pairs)."""
    if isinstance(v, tuple):
        return [_jsonable(x) for x in v]
    return float(v)


def trot_distill_setup(robot: str = "go1", engine: str = "xla",
                       pc_overrides=None, gait_center=None,
                       ) -> TrotDistillSetup:
    """The configuration that produced runs/distill_<robot>/.

    ``pc_overrides`` replaces TrotCostParams fields; ``gait_center`` =
    (thigh_rad, knee_rad) recenters the gait reference away from the
    keyframe home.  The OpenDOG home thigh (2.356 rad) sits AT the bottom
    of its ctrlrange [2.36, 2.8] (our_robot.xml:13-21), so a home-centered
    reference loses the whole backward half of its swing to the clamp —
    recentring at mid-range is what unlocks the stride (round-3 sweep,
    scripts/opendog_walk_sweep.py); opendog therefore defaults
    ``gait_center`` to the sweep winner (2.58, -1.5)."""
    if robot == "go1":
        model = load_go1("flat")
        pc = costs.TrotCostParams(desired_vel_xy=(0.5, 0.0),
                                  target_height=0.265)
        z_band = (0.12, 0.45)
    elif robot == "opendog":
        model = load_opendog("flat")
        # The round-3 sweep winner (runs/opendog_sweep/metrics_refine_cpu
        # .json): full-range thigh swing (amp 0.22 around mid-range 2.58),
        # LOW knee lift (0.12 — high lift trades stride for bounce on this
        # 7 cm-tall robot), 0.4 s period, 0.28 m/s target.  Plant covers
        # 1.26 m / 10 s; the old home-centered reference managed 0.28 m.
        pc = costs.TrotCostParams(desired_vel_xy=(0.28, 0.0),
                                  target_height=0.0703, thigh_amp=0.22,
                                  knee_lift=0.12, w_height=80.0)
        if gait_center is None:
            gait_center = (2.58, -1.5)
        z_band = (0.035, 0.12)
    else:
        raise ValueError(robot)
    if pc_overrides:
        pc = pc._replace(**pc_overrides)
    home_j = np.asarray(model.key_qpos[0])[7:].copy()
    if gait_center is not None:
        assert robot == "opendog", "gait_center wired for the 8-DoF layout"
        thigh_c, knee_c = gait_center
        home_j[np.array([0, 2, 4, 6])] = thigh_c
        home_j[np.array([1, 3, 5, 7])] = knee_c
    cost = costs.trot_cost(model, pc, home_j, legs=robot)
    u_ref = costs.trot_gait_ref(model, pc, home_j, legs=robot)
    period = pc.period_s

    def obs_fn(qpos, qvel, t):
        phase = 2.0 * jnp.pi * t / period
        return jnp.concatenate([
            qpos[2:7],
            qpos[7:],
            qvel[:6] * 0.25,
            qvel[6:] * 0.1,
            jnp.array([jnp.sin(phase), jnp.cos(phase)]),
        ])

    net = MLPActorCritic(action_dim=model.nu, hidden=(512, 256),
                         squash_mean=False)
    mcfg = MPPIConfig(horizon=25, num_samples=512, n_substeps=2,
                      rollout_dt=0.01, noise_sigma=0.10, temperature=0.2,
                      engine=engine)
    recipe = dict(
        robot=robot,
        cost_params={k: _jsonable(v) for k, v in pc._asdict().items()},
        gait_center=(list(gait_center) if gait_center is not None
                     else None),
        noise_sigma=float(mcfg.noise_sigma),
        horizon=int(mcfg.horizon),
    )
    return TrotDistillSetup(model, cost, u_ref, obs_fn, net, mcfg, z_band,
                            recipe)


def cmd_distill_setup(robot: str = "go1", engine: str = "xla",
                      ) -> TrotDistillSetup:
    """Command-conditioned variant of :func:`trot_distill_setup` (BASELINE
    config 5, "velocity-command curriculum"): the cost is
    ``costs.trot_cost_cmd`` — ``step_cost(state, ctrl, prev, (vx, vy,
    yaw_target))`` — and the student observes the command (appended by
    ``make_distiller(command_dim=3)``).  The gait reference stays the
    nominal-speed trot; the network modulates around it per command
    (at cmd=0 the expert holds a stand and the residual cancels the
    marching reference — learnable because the command is observed).

    Mirrors the reference's per-reset randomized desired velocity
    (environments/WalkEnvironment.py:138-151) recast for the MPC expert."""
    base = trot_distill_setup(robot, engine=engine)
    if robot == "go1":
        # QUADRATURE knee-lift timing (lift_phase=pi/2): the open-loop
        # reference then WALKS at a speed set by thigh_amp (measured on
        # the fused-kernel plant: amp 0.2 -> 0.52 m/s, amp 0.3 ->
        # 0.86 m/s; the legacy in-phase lift drags the foot and marches
        # BACKWARD, vx -0.18 at the same amplitude).  With the reference
        # already tracking the commanded speed open-loop, the expert's
        # labels are small stabilizing residuals — the regression target
        # the stand-collapsed v1-v4 students never had.
        # w_heading raised 6 -> 15: the anchored expert (anchor_w ~15)
        # otherwise under-steers — the corrective stride asymmetry pays
        # the anchor price, and the v6 student trotted straight commands
        # with a systematic -0.27 rad yaw drift it never learned to close.
        # amp_v0 = 0.16: calibrated speed->amplitude law — the legacy
        # linear scale under-strides slow commands (cmd 0.25 open-loop
        # walked ~0.1 m/s; calibrated: 0.236).  turn_gain = 1.2:
        # differential-stride steering, turns in place ~0.45 rad / 6 s
        # open-loop and steers while trotting (both measured on the
        # op-graph plant).
        pc = costs.TrotCostParams(desired_vel_xy=(0.5, 0.0),
                                  target_height=0.265,
                                  lift_phase=float(np.pi / 2),
                                  thigh_amp=0.19,
                                  w_heading=15.0,
                                  amp_v0=0.16,
                                  turn_gain=1.2)
        home_j = np.asarray(base.model.key_qpos[0])[7:]
    elif robot == "opendog":
        # Namesake-robot command family.  Gait shape from the round-3
        # sweep winner (gait center (2.58, -1.5), lift_phase = -pi/2: the
        # OPPOSITE quadrature from go1 — its thigh_dir sign differs;
        # +pi/2 marches BACKWARD).  The speed->amplitude law is the
        # PIECEWISE-LINEAR MEASURED one (amp_knots), calibrated open loop
        # on the PALLAS plant — the engine the expert plans on and the
        # student is evaluated on (scripts/calibrate_cmd_gait.py,
        # runs/cmd_calibration/opendog.json).  Round 4 calibrated on the
        # op-graph plant instead and the student under-tracked every
        # command by ~2x (VERDICT r4 item 1): the pallas plant realizes
        # v = 0.184*scale - 0.003 up to scale 1.05 (v_max 0.204 m/s) and
        # SLOWS beyond it, so the law saturates at the measured top
        # stride rather than over-striding.
        # turn_gain 1.2 turns the right way at a stand (measured 0.25
        # rad/s at the d-cap) and while trotting.
        pc = costs.TrotCostParams(desired_vel_xy=(0.28, 0.0),
                                  target_height=0.0703,
                                  thigh_amp=0.26, knee_lift=0.35,
                                  w_height=80.0, w_heading=22.0,
                                  lift_phase=float(-np.pi / 2),
                                  amp_knots=((0.0, 0.0),
                                             (0.0274, 0.18),
                                             (0.0509, 0.3),
                                             (0.0821, 0.45),
                                             (0.1212, 0.6),
                                             (0.1371, 0.9),
                                             (0.2042, 1.05)),
                                  turn_gain=1.2)
        home_j = np.asarray(base.model.key_qpos[0])[7:].copy()
        home_j[np.array([0, 2, 4, 6])] = 2.58
        home_j[np.array([1, 3, 5, 7])] = -1.5
    else:
        raise ValueError(robot)
    cost = costs.trot_cost_cmd(base.model, pc, home_j, legs=robot)
    # command-SCALED gait reference: the student's residual stays small
    # across the command family (a fixed nominal-speed u_ref forces huge
    # residuals at off-nominal commands — measured to regress to a
    # stand-still student)
    u_ref = costs.trot_gait_ref_cmd(base.model, pc, home_j, legs=robot)
    recipe = dict(
        base.recipe, command_conditioned=True,
        command=["vx", "vy", "yaw_target"],
        u_ref="trot_gait_ref_cmd",
        cost_params={k: _jsonable(v) for k, v in pc._asdict().items()})
    return base._replace(cost=cost, u_ref=u_ref, recipe=recipe)


def normalize_recipe(rec: dict) -> dict:
    """Fill cost_params fields added to TrotCostParams AFTER an artifact
    was trained with their NamedTuple defaults: an absent field and a
    default-valued field are behaviorally identical (the cost treats
    them identically), so recipe pins survive purely additive schema
    growth without retraining every committed student.  Non-default
    drift still fails the pin."""
    rec = dict(rec)
    cp = dict(rec.get("cost_params", {}))
    for k, v in costs.TrotCostParams()._asdict().items():
        cp.setdefault(k, ([list(x) if isinstance(x, tuple) else x
                           for x in v] if isinstance(v, tuple)
                          else float(v)))
    rec["cost_params"] = cp
    return rec


def load_student(path: str, setup: TrotDistillSetup, command_dim: int = 0):
    """Restore student params saved by scripts/distill_walk.py (or the
    command-curriculum scripts/distill_cmd.py when ``command_dim > 0``)
    and return the deployed policy:
    ``policy(qpos, qvel, t, prev_ctrl[, cmd]) -> ctrl`` =
    clip(net(obs ++ (prev-home) [++ cmd]) + u_ref(t))."""
    from flax import serialization

    m = setup.model
    lo, hi = np.asarray(m.actuator_ctrlrange).T
    home_ctrl = np.clip(np.asarray(m.key_ctrl[0], np.float32), lo, hi)
    example = setup.obs_fn(jnp.asarray(m.key_qpos[0]),
                           jnp.zeros(m.nv), jnp.float32(0.0))
    example = jnp.concatenate([example, jnp.zeros(m.nu + command_dim)])
    template = setup.net.init(jax.random.PRNGKey(0), example[None])
    with open(path, "rb") as f:
        params = serialization.from_bytes(jax.device_get(template),
                                          f.read())

    ref_takes_cmd = costs.ref_takes_cmd(setup.u_ref)

    def policy(qpos, qvel, t, prev_ctrl, cmd=None):
        obs = setup.obs_fn(qpos, qvel, t)
        obs = jnp.concatenate([obs, prev_ctrl - home_ctrl])
        if command_dim:
            obs = jnp.concatenate([obs, jnp.asarray(cmd, jnp.float32)])
        mean, _, _ = setup.net.apply(params, obs[None])
        u_ref = (setup.u_ref(t, jnp.asarray(cmd, jnp.float32))
                 if ref_takes_cmd else setup.u_ref(t))
        return jnp.clip(mean[0] + u_ref, lo, hi)

    return policy

"""Sim2real training environments — the custom-PPO pipeline that actually
drove the physical robot.

``SymWalkEnv``     — flat-ground phase-conditioned symmetric-gait env
                     (``sim2real/train.py``): 4-dim policy action expanded to
                     8 actuators with diagonal mirroring per 2-step phase
                     cycle (train.py:235-285), 22-dim state (train.py:164),
                     dense shaped reward incl. the real-robot-degree-space
                     leg-positioning penalty (train.py:313-392).
``TerrainWalkEnv`` — heightfield variant (``sim2real/train2.py``): 8-dim
                     action x 50 deg amplitude, 12-dim state (train2.py:183),
                     per-episode procedural terrain (train2.py:203-292),
                     z-stability / step-displacement / low-joint-velocity
                     reward terms (train2.py:346-397).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..physics import State, Terrain, dynamics, spatial, terrain as terrain_lib
from ..sim2real.calibration import Calibration
from .base import Transition

DEG = np.pi / 180.0


@struct.dataclass
class SymWalkState:
    physics: State
    step_count: jax.Array  # () int32 — drives the gait phase
    last_ctrl: jax.Array  # (8,) last clipped sim commands (model order)
    prev_x: jax.Array
    cum_pos_x: jax.Array
    cum_neg_x: jax.Array
    prev_net_fwd: jax.Array
    settled_z: jax.Array  # () trunk z right after the settle
    terrain: Optional[Terrain] = None


class SymWalkEnv:
    """Flat-ground phase-conditioned symmetric walk (sim2real/train.py).

    Actions (4,) in [-1,1]: [FR-thigh delta, knee-pair-1 swing, FL-thigh
    delta, knee-pair-2 swing], scaled by 40 deg (train.py:78) and expanded:
    BL thigh mirrors FR thigh, BR mirrors FL; in phase 0 the FR/BL knees
    swing antisymmetrically, in phase 1 FL/BR (train.py:243-259).
    """

    # constants — sim2real/train.py:67-93
    action_dim = 4
    max_steps = 250
    action_amplitude = 40.0 * DEG
    policy_dt = 0.10
    settle_steps = 100
    orient_term = 25.0 * DEG
    orient_pen_thr = 5.0 * DEG
    yaw_pen_thr = 10.0 * DEG
    leg_home_thr_deg = 15.0
    swing_max_dev_deg = 40.0
    leg_penalty = 0.5
    min_fwd_for_backward_check = 0.05
    backward_frac = 0.75

    def __init__(self, model, terrain_mode: bool = False):
        self.model = model
        self.cal = Calibration(model)
        self.n_substeps = max(1, int(round(self.policy_dt / model.timestep)))
        home = model.key_id("home")
        self.home_qpos = np.asarray(model.key_qpos[home])
        self.home_ctrl = np.asarray(model.key_ctrl[home])  # model order
        self.ctrl_lo = np.asarray(model.actuator_ctrlrange)[:, 0]
        self.ctrl_hi = np.asarray(model.actuator_ctrlrange)[:, 1]
        # map calibration(reference) actuator order -> model order
        self.cal_to_model = np.argsort(self.cal.model_actuator_index)
        self.obs_size = 3 + 8 + 8 + 1 + 2
        # joint qpos addresses in calibration order
        self.qpos_adr = np.asarray(model.actuator_qposadr)[
            self.cal.model_actuator_index
        ]
        self.dof_adr = np.asarray(model.actuator_dof)[
            self.cal.model_actuator_index
        ]

    # ------------------------------------------------------------------
    def expand_action(self, action: jax.Array, phase: jax.Array) -> jax.Array:
        """(4,) policy action + phase -> (8,) clipped sim ctrl in *model*
        actuator order (train.py:235-285)."""
        a = action * self.action_amplitude
        fr_t, k1, fl_t, k2 = a[0], a[1], a[2], a[3]
        is_p0 = phase == 0
        zero = jnp.zeros(())
        deltas_cal = jnp.stack([
            fr_t,                                  # FR_tigh
            jnp.where(is_p0, k1, zero),            # FR_knee
            fl_t,                                  # FL_tigh
            jnp.where(is_p0, zero, k2),            # FL_knee
            fl_t,                                  # BR_tigh (mirrors FL)
            jnp.where(is_p0, zero, -k2),           # BR_knee
            fr_t,                                  # BL_tigh (mirrors FR)
            jnp.where(is_p0, -k1, zero),           # BL_knee
        ])
        target_cal = jnp.asarray(self.cal.sim_home_rad) + deltas_cal
        target_model = target_cal[self.cal_to_model]
        return jnp.clip(target_model, self.ctrl_lo, self.ctrl_hi)

    def _obs(self, state: SymWalkState) -> jax.Array:
        qpos, qvel = state.physics.qpos, state.physics.qvel
        yaw, pitch, roll = spatial.quat_to_ypr(qpos[3:7])
        joint_dev = qpos[self.qpos_adr] - jnp.asarray(self.cal.sim_home_rad)
        joint_vel = qvel[self.dof_adr]
        phase = state.step_count % 2
        # train.py:200-203: progress_norm is 0 or 1; sin(pi*p), cos(pi*p)
        pn = phase.astype(jnp.float32)
        obs = jnp.concatenate([
            jnp.stack([yaw, pitch, roll]),
            joint_dev, joint_vel,
            qvel[0:1],
            jnp.stack([jnp.sin(pn * jnp.pi), jnp.cos(pn * jnp.pi)]),
        ])
        return obs.astype(jnp.float32)

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array):
        physics = State(
            qpos=jnp.asarray(self.home_qpos, jnp.float32),
            qvel=jnp.zeros(self.model.nv, jnp.float32),
            time=jnp.zeros(()),
        )
        # settle under home ctrl (train.py:218-222: 100 raw mj_steps)
        physics, _ = dynamics.step(
            self.model, physics, jnp.asarray(self.home_ctrl), None,
            n_substeps=self.settle_steps,
        )
        state = SymWalkState(
            physics=physics,
            step_count=jnp.zeros((), jnp.int32),
            last_ctrl=jnp.asarray(self.home_ctrl, jnp.float32),
            prev_x=physics.qpos[0],
            cum_pos_x=jnp.zeros(()),
            cum_neg_x=jnp.zeros(()),
            prev_net_fwd=jnp.zeros(()),
            settled_z=physics.qpos[2],
        )
        return state, self._obs(state)

    # ------------------------------------------------------------------
    def step(self, state: SymWalkState, action: jax.Array):
        phase = state.step_count % 2
        ctrl = self.expand_action(action, phase)
        physics, info = dynamics.step(
            self.model, state.physics, ctrl, None, n_substeps=self.n_substeps
        )
        qpos, qvel = physics.qpos, physics.qvel

        dx = qpos[0] - state.prev_x
        cum_pos = state.cum_pos_x + jnp.maximum(dx, 0.0)
        cum_neg = state.cum_neg_x + jnp.maximum(-dx, 0.0)
        net = cum_pos - cum_neg
        dnd = net - state.prev_net_fwd

        fvx = qvel[0]
        r_fwd = 150.0 * fvx
        r_prog = jnp.where(dnd > 0.0005, 15.0 * dnd, 0.0)
        r_bwd = jnp.where(fvx < -0.005, -5.0 * jnp.abs(fvx), 0.0)
        r_alive = 0.05
        r_side = -0.2 * jnp.abs(qvel[1])
        r_ypos = -0.1 * jnp.abs(qpos[1] - self.home_qpos[1])
        yaw, pitch, roll = spatial.quat_to_ypr(qpos[3:7])
        opf = -0.05
        r_orient = (
            jnp.where(jnp.abs(roll) > self.orient_pen_thr,
                      opf * (jnp.abs(roll) - self.orient_pen_thr) ** 2, 0.0)
            + jnp.where(jnp.abs(pitch) > self.orient_pen_thr,
                        opf * (jnp.abs(pitch) - self.orient_pen_thr) ** 2, 0.0)
            + jnp.where(jnp.abs(yaw) > self.yaw_pen_thr,
                        opf * (jnp.abs(yaw) - self.yaw_pen_thr) ** 2, 0.0)
        )
        r_smooth = -0.01 * jnp.sum(jnp.square(ctrl - state.last_ctrl))

        # real-degree-space leg positioning penalty (train.py:342-386)
        ctrl_cal = ctrl[self.cal.model_actuator_index]
        real_deg = self.cal.sim_rad_to_real_deg(ctrl_cal)
        dev_deg = jnp.abs(real_deg - jnp.asarray(self.cal.real_home_deg))
        # calibration order: FR(0,1) FL(2,3) BR(4,5) BL(6,7)
        leg_dev = dev_deg.reshape(4, 2)  # [FR, FL, BR, BL] x [tigh, knee]
        leg_max = jnp.max(leg_dev, axis=1)
        leg_at_home = jnp.all(leg_dev <= self.leg_home_thr_deg, axis=1)
        is_p0 = phase == 0
        # swing legs: p0 -> FR,BL (idx 0,3); p1 -> FL,BR (idx 1,2)
        swinging = jnp.where(
            is_p0,
            jnp.array([True, False, False, True]),
            jnp.array([False, True, True, False]),
        )
        swing_too_far = swinging & (leg_max > self.swing_max_dev_deg)
        stance_off = (~swinging) & (~leg_at_home)
        r_legs = -self.leg_penalty * (
            jnp.sum(swing_too_far) + jnp.sum(stance_off)
        ).astype(jnp.float32)

        reward = (
            r_fwd + r_prog + r_bwd + r_alive + r_side + r_ypos + r_orient
            + r_smooth + r_legs
        )

        bad = ~jnp.all(jnp.isfinite(jnp.concatenate([qpos, qvel])))
        orient_term = (
            (jnp.abs(roll) > self.orient_term)
            | (jnp.abs(pitch) > self.orient_term)
            | (jnp.abs(yaw) > self.orient_term)
        )
        too_backward = (cum_pos > self.min_fwd_for_backward_check) & (
            cum_neg > self.backward_frac * cum_pos
        )
        reward = reward + jnp.where(bad, -20.0, 0.0)
        reward = jnp.where(orient_term & ~bad, reward - 5.0, reward)
        reward = jnp.where(too_backward & ~orient_term & ~bad,
                           reward - 5.0, reward)
        terminated = bad | orient_term | too_backward

        step_count = state.step_count + 1
        truncated = step_count >= self.max_steps
        new_state = state.replace(
            physics=physics,
            step_count=step_count,
            last_ctrl=ctrl,
            prev_x=qpos[0],
            cum_pos_x=cum_pos,
            cum_neg_x=cum_neg,
            prev_net_fwd=net,
        )
        obs = self._obs(new_state)
        return new_state, Transition(
            obs=obs, reward=reward, terminated=terminated,
            truncated=truncated,
            info=dict(sim_target_rad=ctrl, x_position=qpos[0],
                      phase=phase, real_target_deg=real_deg),
        )


class TerrainWalkEnv(SymWalkEnv):
    """Heightfield walk env (sim2real/train2.py) — per-joint 8-dim action,
    12-dim state, per-episode procedural terrain."""

    action_dim = 8
    max_steps = 1000
    action_amplitude = 50.0 * DEG      # train2.py:90
    policy_dt = 0.08                   # train2.py:103
    orient_term = 35.0 * DEG           # train2.py:94
    orient_pen_thr = 15.0 * DEG        # train2.py:96
    yaw_pen_thr = 35.0 * DEG           # train2.py:98
    z_coef = 0.25                      # train2.py:100
    backward_frac = 0.85               # train2.py:402

    def __init__(self, model, ideal_z: float = 0.2):
        super().__init__(model)
        self.obs_size = 3 + 8 + 1
        # "ideal" flat-ground spawn height (train2.py:189)
        self.ideal_z = ideal_z

    def expand_action(self, action: jax.Array, phase: jax.Array) -> jax.Array:
        """Full per-joint deltas in calibration order (train2 step)."""
        deltas_cal = action * self.action_amplitude
        target_cal = jnp.asarray(self.cal.sim_home_rad) + deltas_cal
        target_model = target_cal[self.cal_to_model]
        return jnp.clip(target_model, self.ctrl_lo, self.ctrl_hi)

    def _obs(self, state: SymWalkState) -> jax.Array:
        qpos, qvel = state.physics.qpos, state.physics.qvel
        yaw, pitch, roll = spatial.quat_to_ypr(qpos[3:7])
        joint_dev = qpos[self.qpos_adr] - jnp.asarray(self.cal.sim_home_rad)
        obs = jnp.concatenate([
            jnp.stack([yaw, pitch, roll]), joint_dev, qvel[0:1]
        ])
        return obs.astype(jnp.float32)

    def reset(self, key: jax.Array):
        terr = terrain_lib.generate_terrain(key, self.model)
        physics = State(
            qpos=jnp.asarray(self.home_qpos, jnp.float32),
            qvel=jnp.zeros(self.model.nv, jnp.float32),
            time=jnp.zeros(()),
        )
        # spawn above the local terrain height then settle
        h0 = terr.height[terr.height.shape[0] // 2, terr.height.shape[1] // 2]
        physics = physics.replace(
            qpos=physics.qpos.at[2].set(self.home_qpos[2] + h0)
        )
        physics, _ = dynamics.step(
            self.model, physics, jnp.asarray(self.home_ctrl), terr,
            n_substeps=self.settle_steps,
        )
        state = SymWalkState(
            physics=physics,
            step_count=jnp.zeros((), jnp.int32),
            last_ctrl=jnp.asarray(self.home_ctrl, jnp.float32),
            prev_x=physics.qpos[0],
            cum_pos_x=jnp.zeros(()),
            cum_neg_x=jnp.zeros(()),
            prev_net_fwd=jnp.zeros(()),
            settled_z=physics.qpos[2],
            terrain=terr,
        )
        return state, self._obs(state)

    def step(self, state: SymWalkState, action: jax.Array):
        ctrl = self.expand_action(action, state.step_count % 2)
        physics, info = dynamics.step(
            self.model, state.physics, ctrl, state.terrain,
            n_substeps=self.n_substeps,
        )
        qpos, qvel = physics.qpos, physics.qvel
        dx = qpos[0] - state.prev_x
        cum_pos = state.cum_pos_x + jnp.maximum(dx, 0.0)
        cum_neg = state.cum_neg_x + jnp.maximum(-dx, 0.0)
        net = cum_pos - cum_neg
        dnd = net - state.prev_net_fwd
        fvx = qvel[0]

        r_fwd = 450.0 * fvx
        r_prog = jnp.where(dnd > 0.0005, 20.0 * dnd, 0.0)
        r_bwd = jnp.where(fvx < -0.005, -9.0 * jnp.abs(fvx), 0.0)
        r_step = jnp.where(dx > 0, 70.0 * dx,
                           jnp.where(dx < 0.0005, -1.0, 0.0))
        r_alive = 0.005 + 0.01
        r_side = -0.3 * jnp.abs(qvel[1]) - 0.5 * jnp.abs(qvel[1])
        r_ypos = -0.15 * jnp.abs(qpos[1] - self.home_qpos[1])
        z_dev_settled = qpos[2] - state.settled_z
        z_dev_ideal = qpos[2] - self.ideal_z
        r_z = (
            jnp.where(z_dev_settled < -0.03,
                      -(self.z_coef * 0.5)
                      * (jnp.abs(z_dev_settled) - 0.03) ** 2, 0.0)
            + jnp.where(jnp.abs(z_dev_ideal) > 0.05,
                        -(self.z_coef * 0.25)
                        * (jnp.abs(z_dev_ideal) - 0.05) ** 2, 0.0)
        )
        yaw, pitch, roll = spatial.quat_to_ypr(qpos[3:7])
        opf = -0.08
        r_orient = (
            jnp.where(jnp.abs(roll) > self.orient_pen_thr,
                      opf * (jnp.abs(roll) - self.orient_pen_thr) ** 2, 0.0)
            + jnp.where(jnp.abs(pitch) > self.orient_pen_thr,
                        opf * (jnp.abs(pitch) - self.orient_pen_thr) ** 2, 0.0)
            + jnp.where(jnp.abs(yaw) > self.yaw_pen_thr,
                        opf * (jnp.abs(yaw) - self.yaw_pen_thr) ** 2, 0.0)
        )
        r_smooth = -0.005 * jnp.sum(jnp.square(ctrl - state.last_ctrl))
        jvm = jnp.sum(jnp.abs(qvel[6:14]))
        r_lowvel = -0.05 * jnp.exp(-jvm * 5.0)

        reward = (
            r_fwd + r_prog + r_bwd + r_step + r_alive + r_side + r_ypos
            + r_z + r_orient + r_smooth + r_lowvel
        )

        bad = ~jnp.all(jnp.isfinite(jnp.concatenate([qpos, qvel])))
        orient_term = (
            (jnp.abs(roll) > self.orient_term)
            | (jnp.abs(pitch) > self.orient_term)
            | (jnp.abs(yaw) > self.orient_term * 1.5)
        )
        too_backward = (cum_pos > self.min_fwd_for_backward_check) & (
            cum_neg > self.backward_frac * cum_pos
        )
        reward = reward + jnp.where(bad, -50.0, 0.0)
        reward = jnp.where(orient_term & ~bad, reward - 150.0, reward)
        reward = jnp.where(too_backward & ~orient_term & ~bad,
                           reward - 50.0, reward)
        terminated = bad | orient_term | too_backward

        step_count = state.step_count + 1
        truncated = step_count >= self.max_steps
        new_state = state.replace(
            physics=physics, step_count=step_count, last_ctrl=ctrl,
            prev_x=qpos[0], cum_pos_x=cum_pos, cum_neg_x=cum_neg,
            prev_net_fwd=net,
        )
        return new_state, Transition(
            obs=self._obs(new_state), reward=reward, terminated=terminated,
            truncated=truncated,
            info=dict(sim_target_rad=ctrl, x_position=qpos[0]),
        )

"""Jump and landing task environments on the Go1 (12 DoF).

``JumpEnv``    — jump-onto-cube task: behavioral port of
                 ``environments/JumpEnvironment.py`` +
                 ``rewards/jump_environment_reward_calc.py``.
``LandingEnv`` — landing-from-descent task: port of
                 ``environments/landing_environment.py`` +
                 ``rewards/landing_environment_reward_calc.py``.

Documented deviations: the committed reference files cannot run as-is
(jump_scene.xml duplicates the body name ``trunk``; the landing reward calc
indexes weight keys that don't exist in its own weights dict and calls three
cost methods that are never defined).  These envs implement the documented
*intent* — landing weights phase_sync/front_then_back/weight_distribution use
explicit constants below, and the three landing costs are implemented as the
closest defined semantics in that file (feet force clipping / force imbalance
/ knee-flexion shortfall)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..physics import State, dynamics, spatial
from ..rewards import common
from .base import Transition

DEG = np.pi / 180.0


@struct.dataclass
class JumpEnvState:
    physics: State
    gait: common.GaitState
    step_count: jax.Array
    last_action: jax.Array
    desired_vel: jax.Array


class JumpEnv:
    """Jump-onto-cube (JumpEnvironment.py).  Action (12,) in [-1,1] mapped
    to ctrlrange; obs = [dist-to-cube(2), lin vel(3), v_z, projected
    gravity(3), last action(12)] clipped +-100 (JumpEnvironment.py:99-119)."""

    # jump_environment_reward_calc.py:26-52
    cube_height = 0.5
    cube_position = np.array([1.0, 0.0, 0.5])
    reward_weights = dict(
        height_clearance=0.2, phase_sync=0.8, jump_velocity=1.0,
        landing_precision=3.0, landing_orientation=2.0,
        control_velocity_horizontal=1.0,
    )
    cost_weights = dict(
        collision=1.0, distance_on_liftoff=2.0,
        vertical_velocity_on_landing=1.5, out_of_bounds=3.0,
    )
    tracking_velocity_sigma = 0.45
    desired_vel_min = np.array([1.20, 0.0, 1.20])
    desired_vel_max = np.array([1.25, 0.0, 1.25])
    healthy_range = 20.0 * DEG
    reset_noise_scale = 0.1

    def __init__(self, model, frame_skip: int = 10,
                 max_episode_time: float = 15.0, key_name: str = "home"):
        self.model = model
        self.frame_skip = frame_skip
        self.dt = model.timestep * frame_skip
        self.max_steps = int(max_episode_time / self.dt)
        kid = model.key_id(key_name)
        self.home_qpos = np.asarray(model.key_qpos[kid])
        self.home_ctrl = np.asarray(model.key_ctrl[kid])
        self.ctrlrange = np.asarray(model.actuator_ctrlrange)
        self.nu = model.nu
        self.obs_size = 2 + 3 + 1 + 3 + self.nu
        # non-foot leg bodies for the collision cost
        # (cfrc_ext_contact_indices [2,3,5,6,8,9,11,12] MuJoCo ids -> ours -1)
        self.collision_bodies = tuple(i - 1 for i in (2, 3, 5, 6, 8, 9, 11, 12))

    def scale_action(self, action):
        lo, hi = self.ctrlrange[:, 0], self.ctrlrange[:, 1]
        return lo + (jnp.clip(action, -1.0, 1.0) + 1.0) * 0.5 * (hi - lo)

    def _obs(self, state: JumpEnvState):
        qpos, qvel = state.physics.qpos, state.physics.qvel
        obs = jnp.concatenate([
            jnp.stack([0.3 - qpos[0], 0.3 - qpos[2]]),  # JumpEnvironment.py:101-102
            qvel[:3] * 2.0,
            qvel[2:3],
            common.projected_gravity(qpos[3:7]),
            state.last_action,
        ])
        return jnp.clip(obs, -100.0, 100.0)

    def reset(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        qpos = jnp.asarray(self.home_qpos) + jax.random.uniform(
            k1, (self.model.nq,), minval=-self.reset_noise_scale,
            maxval=self.reset_noise_scale,
        )
        qpos = qpos.at[3:7].set(spatial.quat_normalize(qpos[3:7]))
        physics = State(qpos=qpos.astype(jnp.float32),
                        qvel=jnp.zeros(self.model.nv, jnp.float32),
                        time=jnp.zeros(()))
        state = JumpEnvState(
            physics=physics, gait=common.GaitState.init(),
            step_count=jnp.zeros((), jnp.int32),
            last_action=jnp.zeros(self.nu, jnp.float32),
            desired_vel=common.sample_desired_vel(
                k2, self.desired_vel_min, self.desired_vel_max),
        )
        return state, self._obs(state)

    def _feet_and_collision(self, info):
        fw, fb, ic = dynamics.foot_contact_summary(self.model, info.contact)
        # collision proxy: contact on non-foot leg geoms
        gb = np.array(self.model.geom_body_static)
        leg_mask = np.isin(gb, self.collision_bodies)
        ncol = jnp.sum(
            jnp.where(leg_mask, info.contact.in_contact, False)
        )
        return fw, ic, ncol

    def step(self, state: JumpEnvState, action: jax.Array):
        ctrl = self.scale_action(action)
        physics, pinfo = dynamics.step(
            self.model, state.physics, ctrl, None, n_substeps=self.frame_skip
        )
        qpos, qvel = physics.qpos, physics.qvel
        fw, ic, ncol = self._feet_and_collision(pinfo)
        roll, pitch, yaw = spatial.euler_from_quat(qpos[3:7])

        dist_to_cube = jnp.linalg.norm(
            jnp.asarray(self.cube_position[:2]) - qpos[:2]
        )
        above = qpos[2] >= self.cube_height
        w, cw = self.reward_weights, self.cost_weights
        r_prec = jnp.where(above, jnp.exp(-dist_to_cube), 0.0) * w["landing_precision"]
        r_orient = jnp.exp(-(jnp.abs(roll) + jnp.abs(pitch) + jnp.abs(yaw))) * w["landing_orientation"]
        r_hvel = jnp.exp(-jnp.linalg.norm(qvel[:2])) * w["control_velocity_horizontal"]
        r_clear = jnp.maximum(0.0, qpos[2] - self.cube_height) * w["height_clearance"]
        # phase sync over the air-time state (diagonal pairs)
        air = state.gait.feet_air_time
        r_phase = -(jnp.abs(air[0] - air[1]) + jnp.abs(air[2] - air[3])) * w["phase_sync"]
        vel_err = jnp.sum(jnp.square(state.desired_vel - qvel[:3]))
        r_jvel = jnp.exp(-vel_err / self.tracking_velocity_sigma) * w["jump_velocity"]

        c_lift = jnp.where(~above, jnp.exp(dist_to_cube), 0.0) * cw["distance_on_liftoff"]
        c_vland = jnp.where(above, jnp.square(qvel[2]), 0.0) * cw["vertical_velocity_on_landing"]
        c_oob = jnp.where(dist_to_cube > 1.0, 1.0, 0.0) * cw["out_of_bounds"]
        c_col = ncol.astype(jnp.float32) * cw["collision"]

        reward = jnp.maximum(
            0.0,
            (r_prec + r_orient + r_hvel + r_clear + r_phase + r_jvel)
            - (c_lift + c_vland + c_oob + c_col),
        )

        # update air-time state
        feet_force = jnp.linalg.norm(fw, axis=-1)
        _, gait = common.feet_air_time_reward(
            state.gait, feet_force, self.dt, state.desired_vel[:2]
        )

        # static_stability termination (jump_environment_reward_calc.py:140-150):
        # yaw + roll bands only
        finite = jnp.all(jnp.isfinite(jnp.concatenate([qpos, qvel])))
        terminated = ~(
            finite
            & (jnp.abs(yaw) <= self.healthy_range)
            & (jnp.abs(roll) <= self.healthy_range)
        )
        step_count = state.step_count + 1
        truncated = step_count >= self.max_steps
        new_state = JumpEnvState(
            physics=physics, gait=gait, step_count=step_count,
            last_action=action, desired_vel=state.desired_vel,
        )
        return new_state, Transition(
            obs=self._obs(new_state), reward=reward,
            terminated=terminated, truncated=truncated,
            info=dict(x_position=qpos[0], z_position=qpos[2],
                      landing_precision=r_prec, height_clearance=r_clear),
        )


class LandingEnv(JumpEnv):
    """Landing from the ``descent`` keyframe (z=0.6, go1.xml:227) onto the
    platform cube (landing_scene.xml): rewards phase-sync, front-then-back
    contact and even weight distribution; costs impact force, imbalance and
    lack of knee flexion (landing_environment.py:98-110)."""

    # landing_environment_reward_calc.py:35-50 + chosen weights for the
    # reference's missing keys (see module docstring)
    desired_vel_min = np.array([0.5, 0.0, 0.0])
    desired_vel_max = np.array([0.8, 0.0, 0.0])
    healthy_z = (0.22, 0.65)
    healthy_range = 10.0 * DEG
    phase_sync_w = 1.0
    front_then_back_w = 1.0
    weight_distribution_w = 5.0
    max_contact_force = 100.0
    impact_w = 0.01
    imbalance_w = 0.01
    flexion_w = 0.5

    def __init__(self, model, **kw):
        kw.setdefault("key_name", "descent")
        super().__init__(model, **kw)
        self.obs_size = 3 + 3 + 3 + 12 + 12 + 12
        # knee home angle for the flexion cost
        self.knee_home = -1.8

    def _obs(self, state: JumpEnvState):
        qpos, qvel = state.physics.qpos, state.physics.qvel
        obs = jnp.concatenate([
            qvel[:3], qvel[3:6],
            common.projected_gravity(qpos[3:7]),
            qpos[7:] - jnp.asarray(self.home_qpos[7:]),
            qvel[6:],
            state.last_action,
        ])
        return jnp.clip(obs, -100.0, 100.0)

    def step(self, state: JumpEnvState, action: jax.Array):
        ctrl = self.scale_action(action)
        physics, pinfo = dynamics.step(
            self.model, state.physics, ctrl, None, n_substeps=self.frame_skip
        )
        qpos, qvel = physics.qpos, physics.qvel
        fw, ic, ncol = self._feet_and_collision(pinfo)
        feet_force = jnp.linalg.norm(fw, axis=-1)
        curr = feet_force > 1.0  # [FR, FL, RR, RL]

        front_sync = curr[0] == curr[1]
        rear_sync = curr[2] == curr[3]
        r_phase = jnp.where(front_sync & rear_sync, self.phase_sync_w, 0.0)
        front = curr[0] | curr[1]
        rear = curr[2] | curr[3]
        r_ftb = jnp.where(front & ~rear, self.front_then_back_w, 0.0)
        avg = jnp.mean(feet_force)
        max_dev = jnp.max(jnp.abs(feet_force - avg))
        r_wd = jnp.maximum(0.0, self.weight_distribution_w - max_dev)

        c_impact = self.impact_w * jnp.sum(
            jnp.clip(feet_force - self.max_contact_force, min=0.0)
        )
        c_imb = self.imbalance_w * max_dev
        knees = qpos[jnp.asarray([9, 12, 15, 18])]
        c_flex = self.flexion_w * jnp.sum(
            jnp.clip(knees - self.knee_home, min=0.0)
        ) * (qvel[2] < -0.5)

        reward = jnp.maximum(
            0.0, (r_phase + r_ftb + r_wd) - (c_impact + c_imb + c_flex)
        )

        roll, pitch, yaw = spatial.euler_from_quat(qpos[3:7])
        finite = jnp.all(jnp.isfinite(jnp.concatenate([qpos, qvel])))
        healthy = (
            finite
            & (qpos[2] >= self.healthy_z[0]) & (qpos[2] <= self.healthy_z[1])
            & (jnp.abs(roll) <= self.healthy_range)
            & (jnp.abs(pitch) <= self.healthy_range)
            & (jnp.abs(yaw) <= self.healthy_range)
        )
        step_count = state.step_count + 1
        new_state = JumpEnvState(
            physics=physics, gait=state.gait, step_count=step_count,
            last_action=action, desired_vel=state.desired_vel,
        )
        return new_state, Transition(
            obs=self._obs(new_state), reward=reward,
            terminated=~healthy, truncated=step_count >= self.max_steps,
            info=dict(
                z_position=qpos[2],
                reward_phase_sync=r_phase,
                reward_front_then_back=r_ftb,
                reward_weight_distribution=r_wd,
            ),
        )

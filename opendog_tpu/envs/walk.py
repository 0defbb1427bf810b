"""Walk / turn task environments for the OpenDOG robot (8 DoF).

Behavioral re-implementation of the reference Gymnasium envs as pure
functions:
  * ``WalkEnv`` (variant="v0")  — ``environments/WalkEnvironment.py``
  * ``WalkEnv`` (variant="gpu") — ``environments/walk_environment_gpu.py``
    (adds angular-vel tracking + feet-air-time rewards, torque/vertical-vel/
    stagnation costs, relaxed termination)
  * ``TurnEnv``                 — ``environments/TurnEnvironment.py`` with the
    two-pattern diagonal gait table of ``rewards/TurnRewwardCalc.py:24-27``

Semantics notes (documented deviations):
  * The reference's ``step`` calls ``diagonal_gait_reward`` twice per step
    (once for the reward, once for ``info["patterns_matches"]``,
    WalkEnvironment.py:70,100) which double-advances its mutable pattern
    machine; here the machine advances once and the same value is reported.
  * Contact detection uses the physics engine's active-contact flag rather
    than scanning MuJoCo's contact records.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..physics import State, Terrain, dynamics, spatial
from ..rewards import common
from .base import Transition

# Diagonal-gait pattern tables, feet ordered [FL, FR, BL, BR]
# (walk_environment_reward_calc.py:54-63, TurnRewwardCalc.py:24-27).
WALK_PATTERNS = np.array([
    [True, True, True, True],
    [True, True, False, True],
    [True, False, False, True],
    [True, False, True, True],
    [True, True, True, True],
    [True, True, True, False],
    [False, True, True, False],
    [True, True, True, True],
])
TURN_PATTERNS = np.array([
    [False, True, True, False],
    [True, False, False, True],
])

# Reward/cost weights (walk_environment_reward_calc.py:28-51).
REWARD_WEIGHTS = dict(
    linear_vel_tracking=1.5,
    angular_vel_tracking=0.001,
    healthy=0.015,
    feet_airtime=0.2,
    diagonal_gait_reward=3.0,
)
COST_WEIGHTS = dict(
    cost_distance=5.0,
    torque=0.0001,
    vertical_vel=2.0,
    action_rate=0.01,
    default_joint_position=0.1,
)

OBS_SCALE = dict(  # walk_environment_reward_calc.py:76-82
    linear_velocity=2.0, angular_velocity=0.25, dofs_position=1.0,
    dofs_velocity=0.05,
)


@struct.dataclass
class WalkEnvState:
    physics: State
    gait: common.GaitState
    step_count: jax.Array  # () int32
    last_action: jax.Array  # (nu,)
    desired_vel: jax.Array  # (3,)


class WalkEnv:
    """Functional walk env on the OpenDOG model.

    Action: (8,) in [-1, 1], linearly mapped onto the actuator ctrlrange
    (the reference's ScaleActionWrapper, ScaleActionEnvironment.py:8-23).
    Observation (33,): scaled [lin vel(3), ang vel(3), desired vel(3),
    joint pos dev(8), joint vel(8), last action(8)] clipped to ±100
    (WalkEnvironment.py:115-136).
    """

    def __init__(
        self,
        model,
        variant: str = "v0",
        patterns: np.ndarray = WALK_PATTERNS,
        max_episode_time: float = 15.0,
        frame_skip: int = 10,
        reset_noise_scale: float = 0.02,
        desired_vel_min=(0.5, 0.0, 0.0),
        desired_vel_max=(1.0, 0.0, 0.0),
        terrain: Optional[Terrain] = None,
    ):
        assert variant in ("v0", "gpu", "turn")
        self.model = model
        self.variant = variant
        self.patterns = patterns if variant != "turn" else TURN_PATTERNS
        self.frame_skip = frame_skip
        self.dt = model.timestep * frame_skip  # 0.02 s (50 Hz)
        self.max_steps = int(max_episode_time / self.dt)  # 750
        self.reset_noise_scale = reset_noise_scale
        self.desired_vel_min = np.asarray(desired_vel_min, np.float32)
        self.desired_vel_max = np.asarray(desired_vel_max, np.float32)
        self.terrain = terrain
        self.nu = model.nu
        key_id = model.key_id("home")
        self.home_qpos = np.asarray(model.key_qpos[key_id])
        self.home_ctrl = np.asarray(model.key_ctrl[key_id])
        self.ctrlrange = np.asarray(model.actuator_ctrlrange)
        # default joint position for the cost = key_ctrl reindexed into qpos
        # order (the reference compares qpos[7:] against key_ctrl directly,
        # WalkEnvironment.py:106,116 — actuator order != joint order in
        # our_robot.xml, reproduced faithfully)
        self.default_joint_pos = self.home_ctrl
        self.obs_size = 3 + 3 + 3 + self.nu + self.nu + self.nu

    # ------------------------------------------------------------------
    def scale_action(self, action: jax.Array) -> jax.Array:
        lo, hi = self.ctrlrange[:, 0], self.ctrlrange[:, 1]
        return lo + (jnp.clip(action, -1.0, 1.0) + 1.0) * 0.5 * (hi - lo)

    def _joint_pos_vel(self, physics: State):
        """qpos[7:] and joint qvel (in qpos/joint order, like the reference
        observations WalkEnvironment.py:116-120)."""
        return physics.qpos[7:], physics.qvel[6:]

    def _obs(self, state: WalkEnvState) -> jax.Array:
        q, qd = self._joint_pos_vel(state.physics)
        v = state.physics.qvel
        obs = jnp.concatenate([
            v[:3] * OBS_SCALE["linear_velocity"],
            v[3:6] * OBS_SCALE["angular_velocity"],
            state.desired_vel * OBS_SCALE["linear_velocity"],
            (q - self.default_joint_pos) * OBS_SCALE["dofs_position"],
            qd * OBS_SCALE["dofs_velocity"],
            state.last_action,
        ])
        return jnp.clip(obs, -100.0, 100.0)

    # ------------------------------------------------------------------
    def reset(self, key: jax.Array):
        k1, k2, k3 = jax.random.split(key, 3)
        qpos = jnp.asarray(self.home_qpos) + jax.random.uniform(
            k1, (self.model.nq,), minval=-self.reset_noise_scale,
            maxval=self.reset_noise_scale,
        )
        qpos = qpos.at[3:7].set(spatial.quat_normalize(qpos[3:7]))
        physics = State(
            qpos=qpos.astype(jnp.float32),
            qvel=jnp.zeros(self.model.nv, jnp.float32),
            time=jnp.zeros(()),
        )
        desired = common.sample_desired_vel(
            k2, self.desired_vel_min, self.desired_vel_max
        )
        state = WalkEnvState(
            physics=physics,
            gait=common.GaitState.init(),
            step_count=jnp.zeros((), jnp.int32),
            last_action=jnp.zeros(self.nu, jnp.float32),
            desired_vel=desired,
        )
        return state, self._obs(state)

    # ------------------------------------------------------------------
    def step(self, state: WalkEnvState, action: jax.Array):
        ctrl = self.scale_action(action)
        physics, info = dynamics.step(
            self.model, state.physics, ctrl, self.terrain,
            n_substeps=self.frame_skip,
        )
        fw, fb, in_contact = dynamics.foot_contact_summary(
            self.model, info.contact
        )
        qpos, qvel = physics.qpos, physics.qvel
        quat = qpos[3:7]

        # --- stateful gait rewards ---
        gait = state.gait
        r_gait, gait = common.diagonal_gait_reward(
            gait, in_contact, qvel[0], self.patterns
        )
        feet_force_norm = jnp.linalg.norm(fb, axis=-1)
        r_air, gait = common.feet_air_time_reward(
            gait, feet_force_norm, self.dt, state.desired_vel[:2]
        )

        r_track = common.linear_velocity_tracking(
            state.desired_vel[:2], qvel[:2], qpos[0]
        )
        r_safe = common.safe_range_reward(quat)
        q_joints = qpos[7:]
        qfrc_act = info.qfrc_actuator[6:]
        c_default = common.default_joint_position_cost(
            q_joints, self.default_joint_pos
        )
        c_rate = common.action_rate_cost(state.last_action, action)

        if self.variant == "v0":
            positives = (
                r_track * REWARD_WEIGHTS["linear_vel_tracking"]
                + r_safe * REWARD_WEIGHTS["healthy"]
                + r_gait * REWARD_WEIGHTS["diagonal_gait_reward"]
            )
            costs = (
                c_default * COST_WEIGHTS["default_joint_position"]
                + c_rate * COST_WEIGHTS["action_rate"]
                + jnp.abs(qpos[1])  # y_cost, unweighted (WalkEnvironment.py:108)
            )
        elif self.variant == "gpu":
            r_ang = common.angular_velocity_tracking(
                state.desired_vel[2], qvel[5]
            )
            positives = (
                r_track * REWARD_WEIGHTS["linear_vel_tracking"]
                + r_safe * REWARD_WEIGHTS["healthy"]
                + r_ang * REWARD_WEIGHTS["angular_vel_tracking"]
                + r_gait * REWARD_WEIGHTS["diagonal_gait_reward"]
                + r_air * REWARD_WEIGHTS["feet_airtime"]
            )
            costs = (
                common.torque_cost(qfrc_act) * COST_WEIGHTS["torque"]
                + c_rate * COST_WEIGHTS["action_rate"]
                + jnp.square(qvel[2]) * COST_WEIGHTS["vertical_vel"]
                + c_default * COST_WEIGHTS["default_joint_position"]
            )
        else:  # turn (TurnEnvironment.py + TurnRewwardCalc weights)
            positives = (
                r_safe * 0.015
                + r_gait * 3.0
                + r_air * 0.2
            )
            costs = c_default * 0.1
        reward = jnp.maximum(0.0, positives - costs)

        state_vec = jnp.concatenate([qpos, qvel])
        healthy = common.is_healthy(quat, state_vec)
        if self.variant == "gpu":
            # relaxed termination (walk_environment_gpu.py:61-63)
            terminated = (~healthy) & (~(qvel[0] < 0.5))
        else:
            terminated = ~healthy
        step_count = state.step_count + 1
        truncated = step_count >= self.max_steps

        new_state = WalkEnvState(
            physics=physics,
            gait=gait,
            step_count=step_count,
            last_action=action,
            desired_vel=state.desired_vel,
        )
        obs = self._obs(new_state)
        trans = Transition(
            obs=obs,
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            info=dict(
                x_position=qpos[0],
                y_position=qpos[1],
                distance_from_origin=jnp.linalg.norm(qpos[:2]),
                patterns_matches=r_gait,
                linear_vel_tracking_reward=r_track,
                reward_ctrl=common.torque_cost(qfrc_act),
                paw_contact_forces=fb,
                feet_in_contact=in_contact,
            ),
        )
        return new_state, trans


def TurnEnv(model, **kw):
    """Turning task (TurnEnvironment.py:35-44)."""
    return WalkEnv(model, variant="turn", **kw)

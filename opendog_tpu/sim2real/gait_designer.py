"""Scripted open-loop trot designer + in-sim gait playback.

``design_trot``  — behavioural port of ``sim2real/main.py:63-151``: builds an
initial-hold + N alternating-diagonal shuffle steps + return-home sequence
from hand-tuned thigh/knee deltas, clamped to ctrlrange, with both sim-radian
and real-degree targets.

``replay_gait``  — the inverse pipeline of ``sim2real/run.py:243-351``: load
a real-degree gait, convert to sim radians (clamped), replay it through the
physics with each step held for its duration, and report tracking metrics.
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..physics import State, dynamics, make_state
from .calibration import ACTUATOR_NAMES_ORDERED, Calibration


class TrotParams(NamedTuple):
    """Hand-tuned gait deltas (sim radians) — sim2real/main.py:68-76."""

    thigh_forward: float = 0.10
    thigh_backward: float = -0.10
    back_knee_lift: float = -0.35
    back_knee_extend: float = 0.2
    front_knee_lift: float = -0.50
    front_knee_extend: float = 0.15
    phase_duration: float = 0.40
    initial_hold: float = 1.0
    num_steps: int = 12


def design_trot(model, params: TrotParams = TrotParams()):
    """Returns (durations (T,), sim_ctrl (T, nu) in calibration order,
    real_deg (T, nu)).  Step 0 holds home; steps alternate FR/BL and FL/BR
    swings; the last step returns home (main.py:84-151)."""
    cal = Calibration(model)
    home = dict(zip(cal.order, cal.sim_home_rad))
    lo = dict(zip(cal.order, cal.ctrl_lo))
    hi = dict(zip(cal.order, cal.ctrl_hi))
    p = params

    def clamp(name, v):
        return float(np.clip(v, lo[name], hi[name]))

    def pose(**deltas) -> List[float]:
        return [clamp(n, home[n] + deltas.get(n, 0.0)) for n in cal.order]

    rows = [pose()]
    durations = [p.initial_hold]
    for step in range(p.num_steps):
        if step % 2 == 0:  # FR/BL swing
            rows.append(pose(
                FR_tigh_actuator=p.thigh_forward,
                FR_knee_actuator=p.front_knee_lift,
                BL_tigh_actuator=p.thigh_forward,
                BL_knee_actuator=p.back_knee_lift,
                FL_tigh_actuator=p.thigh_backward,
                FL_knee_actuator=p.front_knee_extend,
                BR_tigh_actuator=p.thigh_backward,
                BR_knee_actuator=p.back_knee_extend,
            ))
        else:  # FL/BR swing
            rows.append(pose(
                FL_tigh_actuator=p.thigh_forward,
                FL_knee_actuator=p.front_knee_lift,
                BR_tigh_actuator=p.thigh_forward,
                BR_knee_actuator=p.back_knee_lift,
                FR_tigh_actuator=p.thigh_backward,
                FR_knee_actuator=p.front_knee_extend,
                BL_tigh_actuator=p.thigh_backward,
                BL_knee_actuator=p.back_knee_extend,
            ))
        durations.append(p.phase_duration)
    rows.append(pose())
    durations.append(1.0)

    sim_ctrl = np.asarray(rows, dtype=np.float32)
    real_deg = np.asarray(
        jax.vmap(cal.sim_rad_to_real_deg)(jnp.asarray(sim_ctrl))
    )
    return np.asarray(durations), sim_ctrl, real_deg


def replay_gait(
    model,
    durations: Sequence[float],
    sim_ctrl_cal_order: np.ndarray,
    settle_steps: int = 100,
) -> Dict[str, np.ndarray]:
    """Replay a gait through the physics (run.py:243-351 without the
    wall-clock pacing — on-device time is exact).  Each step's target is held
    for its duration at the model timestep.  Returns trajectories of the
    trunk pose and per-step joint tracking error."""
    cal = Calibration(model)
    inv = np.argsort(cal.model_actuator_index)
    ctrl_model = np.asarray(sim_ctrl_cal_order)[:, inv]

    state = make_state(model, "home")
    home_ctrl = jnp.asarray(np.asarray(model.key_ctrl[model.key_id("home")]))
    state, _ = dynamics.step(model, state, home_ctrl, None,
                             n_substeps=settle_steps)

    trunk, err = [], []
    qadr = np.asarray(model.actuator_qposadr)
    # hoisted: one compile per chunk size for the whole replay (rebuilding
    # these inside the loop re-traced every gait step)
    step128 = jax.jit(
        lambda s, c: dynamics.step(model, s, c, n_substeps=128)[0]
    )
    step1 = jax.jit(
        lambda s, c: dynamics.step(model, s, c, n_substeps=1)[0]
    )
    for dur, ctrl in zip(durations, ctrl_model):
        n = max(1, int(round(float(dur) / model.timestep)))
        cvec = jnp.asarray(ctrl)
        # chunked stepping keeps compile variants few (powers of two)
        remaining = n
        while remaining >= 128:
            state = step128(state, cvec)
            remaining -= 128
        for _ in range(remaining):
            state = step1(state, cvec)
        trunk.append(np.asarray(state.qpos[:7]))
        err.append(np.abs(np.asarray(state.qpos[qadr]) - ctrl).max())
    return dict(trunk=np.asarray(trunk), max_joint_err=np.asarray(err))

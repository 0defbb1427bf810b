"""walk.json gait export / import — THE sim2real artifact.

Schema parity with ``sim2real/train.py:600-636``: a JSON list of
``{"duration": seconds, "targets_deg": {actuator_name: degrees}}`` steps in
real-robot degrees, playable by the robot apps (``examples/udp_walk.py``) and
re-importable into simulation (``sim2real/run.py:60-79``).
"""
from __future__ import annotations

import json
from typing import Callable, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..envs.sim2real_walk import SymWalkEnv
from .calibration import ACTUATOR_NAMES_ORDERED, Calibration

JSON_MAX_STEPS_EPISODIC = 50   # sim2real/train.py:51
JSON_MAX_STEPS_FINAL = 100     # sim2real/train.py:52


def save_gait(path: str, durations: Sequence[float],
              targets_deg: np.ndarray,
              names: Sequence[str] = ACTUATOR_NAMES_ORDERED) -> None:
    """Write a gait: targets_deg (T, 8) in ``names`` order."""
    seq = [
        {
            "duration": round(float(d), 3),
            "targets_deg": {
                n: round(float(v), 2) for n, v in zip(names, row)
            },
        }
        for d, row in zip(durations, np.asarray(targets_deg))
    ]
    with open(path, "w") as f:
        json.dump(seq, f, indent=2)


def load_gait(path: str, names: Sequence[str] = ACTUATOR_NAMES_ORDERED):
    """Read a walk.json; returns (durations (T,), targets_deg (T, 8))."""
    with open(path) as f:
        seq = json.load(f)
    durations = np.array([s["duration"] for s in seq], dtype=np.float64)
    targets = np.array(
        [[s["targets_deg"][n] for n in names] for s in seq], dtype=np.float64
    )
    return durations, targets


def generate_walk_json(
    policy_fn: Callable[[jax.Array], jax.Array],
    env: SymWalkEnv,
    path: str,
    num_steps: int = JSON_MAX_STEPS_EPISODIC,
    key: Optional[jax.Array] = None,
) -> int:
    """Deterministic policy rollout → real-degree gait file
    (sim2real/train.py:600-636).  ``policy_fn(obs) -> action`` is the policy
    mean.  Returns the number of steps written."""
    key = key if key is not None else jax.random.PRNGKey(0)
    state, obs = env.reset(key)
    step = jax.jit(env.step)
    rows: List[np.ndarray] = []
    durations: List[float] = []
    for _ in range(num_steps):
        action = policy_fn(obs)
        state, trans = step(state, action)
        real_deg = np.asarray(trans.info["real_target_deg"])
        rows.append(real_deg)
        durations.append(env.policy_dt)
        obs = trans.obs
        if bool(trans.terminated) or bool(trans.truncated):
            break
    if not rows:
        return 0
    save_gait(path, durations, np.stack(rows), env.cal.order)
    return len(rows)


def transform_gait(
    targets_deg: np.ndarray,
    sign=None,
    offset_deg=None,
    names: Sequence[str] = ACTUATOR_NAMES_ORDERED,
    invert: Sequence[str] = (),
) -> np.ndarray:
    """Per-channel sign/offset gait transformer (the examples/invert.py and
    invertplay.py utilities generalised): ``invert`` lists actuator names
    whose sign flips (invert.py:5-18 flips the front thigh channels);
    ``sign``/``offset_deg`` apply elementwise."""
    t = np.array(targets_deg, dtype=np.float64)
    if sign is not None:
        t = t * np.asarray(sign, dtype=np.float64)
    if offset_deg is not None:
        t = t + np.asarray(offset_deg, dtype=np.float64)
    for n in invert:
        t[:, list(names).index(n)] *= -1.0
    return t


def gait_to_sim_ctrl(model, durations, targets_deg):
    """Real-deg gait → per-step sim ctrl vectors in *model* actuator order
    with ctrlrange clamping (the inverse pipeline of sim2real/run.py)."""
    cal = Calibration(model)
    sim_cal = np.asarray(
        jax.vmap(cal.real_deg_to_sim_rad)(jnp.asarray(targets_deg,
                                                      jnp.float32))
    )
    inv = np.argsort(cal.model_actuator_index)
    return sim_cal[:, inv]

"""Sim ↔ real joint-angle calibration maps.

Re-encoding of the reference's sim-to-real mapping configuration
(``sim2real/train.py:94-130``): the real robot's home pose in degrees per
actuator, per-joint scale factors, and the conversion

    real_deg = real_home_deg + scale * degrees(sim_rad - sim_home_rad)

and its inverse (``sim2real/run.py:60-79``).  The actuator order is the
reference's ``ACTUATOR_NAMES_ORDERED`` (FR, FL, BR, BL interleaved —
sim2real/train.py:25-30), which differs from the MJCF actuator declaration
order; both orderings are supported explicitly.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import jax.numpy as jnp

# sim2real/train.py:25-30 — the canonical sim2real actuator ordering.
ACTUATOR_NAMES_ORDERED = (
    "FR_tigh_actuator", "FR_knee_actuator",
    "FL_tigh_actuator", "FL_knee_actuator",
    "BR_tigh_actuator", "BR_knee_actuator",
    "BL_tigh_actuator", "BL_knee_actuator",
)

# Real-robot home pose in degrees (sim2real/train.py:95-101).
REAL_HOME_DEG: Dict[str, float] = {
    "FR_tigh_actuator": -45.0, "FR_knee_actuator": 45.0,
    "FL_tigh_actuator": 45.0,  "FL_knee_actuator": 45.0,
    "BR_tigh_actuator": 45.0,  "BR_knee_actuator": -45.0,
    "BL_tigh_actuator": 45.0,  "BL_knee_actuator": -45.0,
}

# Per-joint scale factors (sim2real/train.py:102 — all 1.0 in the reference).
JOINT_SCALE: Dict[str, float] = {n: 1.0 for n in ACTUATOR_NAMES_ORDERED}


class Calibration:
    """Vectorised calibration for a loaded model.

    ``order`` selects which actuator ordering the vectors use; defaults to
    the reference sim2real ordering."""

    def __init__(self, model, order: Sequence[str] = ACTUATOR_NAMES_ORDERED):
        self.order = tuple(order)
        idx = [model.actuator_names.index(n) for n in self.order]
        self.model_actuator_index = np.array(idx, dtype=np.int32)
        qposadr = np.asarray(model.actuator_qposadr)[idx]
        home_qpos = np.asarray(model.key_qpos[model.key_id("home")])
        self.sim_home_rad = home_qpos[qposadr].astype(np.float32)
        self.real_home_deg = np.array(
            [REAL_HOME_DEG[n] for n in self.order], dtype=np.float32
        )
        self.scale = np.array(
            [JOINT_SCALE[n] for n in self.order], dtype=np.float32
        )
        cr = np.asarray(model.actuator_ctrlrange)[idx]
        self.ctrl_lo = cr[:, 0].astype(np.float32)
        self.ctrl_hi = cr[:, 1].astype(np.float32)

    # -- conversions (jit/vmap-safe on jnp inputs, numpy on numpy inputs) --
    def sim_rad_to_real_deg(self, sim_rad):
        """sim2real/train.py:120-130."""
        delta = sim_rad - self.sim_home_rad
        return self.real_home_deg + self.scale * jnp.degrees(delta)

    def real_deg_to_sim_rad(self, real_deg, clip: bool = True):
        """Inverse map with ctrlrange clamping (sim2real/run.py:60-79)."""
        delta_deg = (real_deg - self.real_home_deg) / self.scale
        sim = self.sim_home_rad + jnp.radians(delta_deg)
        if clip:
            sim = jnp.clip(sim, self.ctrl_lo, self.ctrl_hi)
        return sim

    def reorder_from_model(self, ctrl_model_order):
        """Model-declaration-order ctrl vector -> calibration order."""
        return ctrl_model_order[..., self.model_actuator_index]

    def reorder_to_model(self, ctrl_cal_order):
        inv = np.argsort(self.model_actuator_index)
        return ctrl_cal_order[..., inv]

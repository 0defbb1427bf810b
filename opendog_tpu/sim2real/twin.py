"""Hardware → simulation digital twin.

Port of ``sim2real/view.py``: live robot encoder angles drive the sim's
actuator targets so the simulated robot mirrors the physical one
(view.py:268-284).  The reference streams angles from each ESP's SSE
endpoint and applies empirically-debugged index/sign/offset tables
(view.py:21-69); here the channel mapping is the calibration map (the same
real-deg → sim-rad conversion the trained pipeline uses) plus an optional
per-channel sign/offset override table for hardware quirks.
"""
from __future__ import annotations

import threading
import time
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..physics import State, dynamics, make_state
from .calibration import ACTUATOR_NAMES_ORDERED, Calibration


class DigitalTwin:
    def __init__(
        self,
        model,
        sign: Optional[Sequence[float]] = None,
        offset_deg: Optional[Sequence[float]] = None,
    ):
        self.model = model
        self.cal = Calibration(model)
        self.sign = np.asarray(
            sign if sign is not None else np.ones(8), np.float32
        )
        self.offset_deg = np.asarray(
            offset_deg if offset_deg is not None else np.zeros(8), np.float32
        )
        self.state = make_state(model, "home")
        self._step = jax.jit(
            lambda s, c: dynamics.step(model, s, c, n_substeps=1)[0]
        )
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def real_angles_to_ctrl(self, angles_deg: Sequence[float]) -> jnp.ndarray:
        """Real encoder degrees (calibration order) → clamped sim ctrl in
        model order (view.py:268-284 + run.py:60-79)."""
        corrected = self.sign * np.asarray(angles_deg, np.float32) + self.offset_deg
        sim_cal = self.cal.real_deg_to_sim_rad(jnp.asarray(corrected))
        inv = np.argsort(self.cal.model_actuator_index)
        return sim_cal[inv]

    def mirror_once(self, angles_deg: Sequence[float], substeps: int = 8):
        """Apply one angle snapshot and advance the sim."""
        ctrl = self.real_angles_to_ctrl(angles_deg)
        with self._lock:
            for _ in range(substeps):
                self.state = self._step(self.state, ctrl)
            return self.state

    def snapshot(self) -> State:
        with self._lock:
            return self.state

    # -- live mirroring from a QuadPilotBody telemetry store --------------
    def start_mirroring(self, body, rate_hz: float = 50.0):
        def loop():
            period = 1.0 / rate_hz
            while not self._stop.is_set():
                m0 = body.get_latest_motor_data_for_esp(0)
                m1 = body.get_latest_motor_data_for_esp(1)
                if m0 and m1:
                    angles = list(m0["angles"]) + list(m1["angles"])
                    self.mirror_once(angles)
                time.sleep(period)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1.0)

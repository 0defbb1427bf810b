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
        device=None,
    ):
        """``device`` pins the twin to a specific backend (pass a CPU
        device when the main backend is a remote TPU: the twin state is
        read back to host every tick, and a blocking device->host fetch
        over the axon tunnel costs ~40 ms RTT — apps/mpc_bridge.py)."""
        self.model = model
        self.cal = Calibration(model)
        self.device = device
        self.sign = np.asarray(
            sign if sign is not None else np.ones(8), np.float32
        )
        self.offset_deg = np.asarray(
            offset_deg if offset_deg is not None else np.zeros(8), np.float32
        )
        with self._on_device():
            self.state = make_state(model, "home")
            if device is not None:
                self.state = jax.device_put(self.state, device)
        self._step_cache = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _on_device(self):
        import contextlib

        return (jax.default_device(self.device) if self.device is not None
                else contextlib.nullcontext())

    def real_angles_to_ctrl(self, angles_deg: Sequence[float]) -> jnp.ndarray:
        """Real encoder degrees (calibration order) → clamped sim ctrl in
        model order (view.py:268-284 + run.py:60-79)."""
        corrected = self.sign * np.asarray(angles_deg, np.float32) + self.offset_deg
        with self._on_device():
            sim_cal = self.cal.real_deg_to_sim_rad(jnp.asarray(corrected))
            inv = np.argsort(self.cal.model_actuator_index)
            return sim_cal[inv]

    def _step(self, substeps: int):
        """One jitted ``substeps``-substep advance (cached per count: a
        single dispatch per mirror tick, not ``substeps`` of them)."""
        if substeps not in self._step_cache:
            self._step_cache[substeps] = jax.jit(
                lambda s, c: dynamics.step(
                    self.model, s, c, n_substeps=substeps)[0]
            )
        return self._step_cache[substeps]

    def mirror_once(self, angles_deg: Sequence[float], substeps: int = 8):
        """Apply one angle snapshot and advance the sim."""
        ctrl = self.real_angles_to_ctrl(angles_deg)
        with self._lock, self._on_device():
            self.state = self._step(substeps)(self.state, ctrl)
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

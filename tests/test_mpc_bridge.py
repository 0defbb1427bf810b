"""MPC over the wire — full-stack loop test (VERDICT r2 item 4).

Closes the loop the reference's deepest path traces
(``sim2real/run_robot.py:252-263``) with MPC in the policy seat:
``RealtimeController.bridge_tick`` → ``QuadPilotBody.set_angles`` (UDP/JSON
+ ACK) → C++ ``firmware_sim`` 500 Hz PID servo → broadcast telemetry →
measured angles → ``DigitalTwin`` state estimate → next tick.  Two real
firmware-simulator processes stand in for the two ESP32s; nothing is
short-circuited in Python.
"""
import os
import subprocess
import time

import numpy as np
import pytest

FIRMWARE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "opendog_tpu", "native", "firmware_sim"
)
BIN = os.path.join(FIRMWARE_DIR, "firmware_sim")


from conftest import build_native, worker_port_offset

_worker_offset = worker_port_offset

LISTEN = 18845 + _worker_offset()
PORT1, PORT2 = LISTEN + 1, LISTEN + 2


@pytest.fixture(scope="module")
def firmware_pair():
    if not build_native(FIRMWARE_DIR, BIN):
        pytest.skip("no make / firmware binary")
    procs = [
        subprocess.Popen(
            [BIN, "--port", str(p), "--telemetry-port", str(LISTEN)],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for p in (PORT1, PORT2)
    ]
    time.sleep(0.3)
    yield procs
    for p in procs:
        p.terminate()
    for p in procs:
        p.wait(timeout=5)


@pytest.mark.parametrize("compensate", [False, True],
                         ids=["plain", "compensated"])
def test_mpc_bridge_closed_loop(firmware_pair, compensate):
    import jax

    from opendog_tpu.apps.mpc_bridge import MPCBridge
    from opendog_tpu.sdk import QuadPilotBody
    from opendog_tpu.assets import load_opendog
    from opendog_tpu.solvers import MPPIConfig, costs
    from opendog_tpu.solvers.mpc import RealtimeController

    m = load_opendog("flat")
    cost = costs.standing_cost(
        m, target_height=0.0694,
        home_joint_qpos=np.asarray(m.key_qpos[0])[7:])
    cfg = MPPIConfig(horizon=4, num_samples=16, n_substeps=1,
                     rollout_dt=0.01, noise_sigma=0.05)
    rtc = RealtimeController(m, cost, cfg, lag=1,
                             key=jax.random.PRNGKey(0),
                             compensate=compensate)
    body = QuadPilotBody(ip1="127.0.0.1", ip2="127.0.0.1",
                         port1=PORT1, port2=PORT2,
                         listen_for_broadcasts=True, listen_port=LISTEN)
    try:
        bridge = MPCBridge(m, rtc, body)
        assert bridge.bring_up(settle_s=1.0), "bring-up not ACKed"
        # telemetry must be flowing before the loop leans on it
        deadline = time.time() + 3.0
        while time.time() < deadline:
            if (body.is_data_available_from_esp(0)
                    and body.is_data_available_from_esp(1)):
                break
            time.sleep(0.05)
        # prime the solver jit off the clock, then measure a paced loop
        # (run() starts a fresh tracking window on its own)
        for _ in range(3):
            bridge.tick()
            time.sleep(0.02)
        metrics = bridge.run(75, rate_hz=50.0)
    finally:
        body.close()

    assert metrics["ticks"] == 75
    assert np.isfinite(metrics["host_blocking_p99_ms"])
    # the servo must actually track the MPC commands over the wire: the
    # standing solve jitters a few degrees around home, the 500 Hz PID
    # follows within a small RMSE at its characteristic delay
    assert np.isfinite(metrics["joint_track_rmse_deg"])
    assert metrics["joint_track_rmse_deg"] < 8.0, metrics
    assert metrics["joint_track_delay_ticks"] >= 0
    # the twin (body-state estimate driven by measured angles) stays up
    assert metrics["twin_healthy"], metrics
    assert abs(metrics["twin_trunk_z"] - 0.0694) < 0.03
    assert metrics["compensated"] is compensate


def test_measured_angles_shape(firmware_pair):
    from opendog_tpu.apps.mpc_bridge import read_measured_angles
    from opendog_tpu.sdk import QuadPilotBody

    body = QuadPilotBody(ip1="127.0.0.1", ip2="127.0.0.1",
                         port1=PORT1, port2=PORT2,
                         listen_for_broadcasts=True, listen_port=LISTEN)
    try:
        body.set_send_interval(10)
        deadline = time.time() + 3.0
        angles = None
        while time.time() < deadline:
            angles = read_measured_angles(body)
            if angles is not None:
                break
            time.sleep(0.05)
        assert angles is not None
        assert angles.shape == (8,)
        assert np.all(np.isfinite(angles))
    finally:
        body.close()

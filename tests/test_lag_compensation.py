"""Delay compensation for the control pipeline (make_mpc(lag_compensation=)
and RealtimeController(compensate=)).

The pipelined deployment loop acts on a plan from ``lag`` ticks ago
(bench.py runs lag=3 over the axon tunnel).  runs/lag_sweep quantified the
price: final_x 4.21 -> 2.81 m and fall_rate 0 -> 1/3 at lag=3.
Compensation rolls the solve's start state forward through the queued
(dispatched-but-not-yet-applied) controls so every plan starts from the
state it will actually land on — with a deterministic plant the prediction
is EXACT, which is what these tests pin.
"""
import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.assets import load_opendog
from opendog_tpu.physics import make_state
from opendog_tpu.solvers import MPPIConfig, costs, make_mpc
from opendog_tpu.solvers.mpc import RealtimeController


def _setup():
    m = load_opendog("flat")
    cost = costs.standing_cost(
        m, target_height=0.0694,
        home_joint_qpos=np.asarray(m.key_qpos[0])[7:])
    cfg = MPPIConfig(horizon=4, num_samples=16, n_substeps=1,
                     rollout_dt=0.01, noise_sigma=0.05)
    return m, cost, cfg


def test_compensated_prediction_matches_actual_plant():
    """The state the compensated solve plans from at tick t must equal the
    ACTUAL plant state when that solve's action is applied (tick t+lag):
    the prediction rolls through exactly the controls the plant will
    apply, and the plant is deterministic."""
    m, cost, cfg = _setup()
    lag = 2
    init, _, run = make_mpc(m, cost, cfg, plant_substeps=2, ctrl_lag=lag,
                            lag_compensation=True)
    carry = init(jax.random.PRNGKey(3), make_state(m, "home"))
    _, traj = jax.jit(lambda c: run(c, 8))(carry)
    pred = np.asarray(traj["solve_from_qpos"])   # predicted state at t+lag
    qpos = np.asarray(traj["qpos"])              # actual plant AFTER tick s
    # plant state entering tick t+lag == plant state after tick t+lag-1
    for t in range(8 - lag):
        np.testing.assert_allclose(pred[t], qpos[t + lag - 1],
                                   rtol=1e-5, atol=1e-6)


def test_compensated_first_solve_sees_future_not_initial_state():
    """Uncompensated lag-k ticks solve from the CURRENT (stale-by-k) state;
    compensated ticks solve from the predicted future state — so the tick-0
    solves must differ, while the hold-control prefix is identical.  The
    start state gets a falling velocity so the prediction horizon spans
    real motion (a settled stance barely moves in 2 ticks)."""
    m, cost, cfg = _setup()
    lo = np.asarray(m.actuator_ctrlrange)[:, 0]
    hi = np.asarray(m.actuator_ctrlrange)[:, 1]
    hold = np.clip(np.asarray(m.key_ctrl[0]), lo, hi)
    st0 = make_state(m, "home")
    st0 = st0.replace(qvel=st0.qvel.at[2].set(-0.3).at[0].set(0.2))

    outs, preds = {}, {}
    for comp in (False, True):
        init, _, run = make_mpc(m, cost, cfg, plant_substeps=2, ctrl_lag=2,
                                lag_compensation=comp)
        carry = init(jax.random.PRNGKey(7), st0)
        _, traj = jax.jit(lambda c: run(c, 4))(carry)
        outs[comp] = np.asarray(traj["ctrl"])
        if comp:
            preds[comp] = np.asarray(traj["solve_from_qpos"])
    # both pipelines apply the hold control while priming
    for comp in (False, True):
        np.testing.assert_allclose(outs[comp][0], hold, atol=1e-6)
        np.testing.assert_allclose(outs[comp][1], hold, atol=1e-6)
    # the predicted application state is materially ahead of the stale
    # state the uncompensated solve uses (the trunk fell and advanced)
    q0 = np.asarray(st0.qpos)
    assert abs(preds[True][0][2] - q0[2]) > 1e-4
    assert abs(preds[True][0][0] - q0[0]) > 1e-4
    # tick 2 applies each pipeline's tick-0 solve: stale-state vs
    # predicted-state plans — same PRNG stream, different start state
    assert np.max(np.abs(outs[False][2] - outs[True][2])) > 1e-5


def test_realtime_controller_compensated_bridge():
    """Bridge mode with compensate=True: in-range controls, a device-side
    in-flight queue of the right shape, and drain() flushes cleanly."""
    m, cost, cfg = _setup()
    rtc = RealtimeController(m, cost, cfg, lag=2, plant_substeps=2,
                             compensate=True)
    st = make_state(m, "home")
    qpos, qvel = np.asarray(st.qpos), np.asarray(st.qvel)
    lo = np.asarray(m.actuator_ctrlrange)[:, 0]
    hi = np.asarray(m.actuator_ctrlrange)[:, 1]
    for i in range(5):
        ctrl = rtc.bridge_tick(qpos, qvel, t=i * 0.02)
        assert ctrl.shape == (m.nu,)
        assert np.all(ctrl >= lo - 1e-5) and np.all(ctrl <= hi + 1e-5)
    assert rtc._queue_dev.shape == (2, m.nu)
    last = rtc.drain()
    assert last.shape == (m.nu,)
    assert np.isfinite(last).all()


def test_lag_sweep_compensate_flag(tmp_path):
    """scripts/lag_sweep.py --compensate runs end-to-end and tags output."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "sweep.json"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "lag_sweep.py"),
         "--smoke", "--ticks", "6", "--seeds", "1", "--lags", "0", "2",
         "--compensate", "--out", str(out)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": "",
             "PYTHONPATH": repo + ":"
             + os.environ.get("PYTHONPATH", "")})
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(out.read_text())
    assert res["metric"] == "lag_sweep"
    assert res["compensated"] is True
    assert len(res["results"]) == 2

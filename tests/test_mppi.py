import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.assets import load_go1, load_opendog
from opendog_tpu.physics import make_state
from opendog_tpu.solvers import MPPIConfig, costs, make_mpc
from opendog_tpu.solvers.mpc import RealtimeController


def test_mppi_standing_balance_opendog():
    """BASELINE config 1: standing-balance hold via MPC keeps the robot
    upright at its equilibrium height."""
    m = load_opendog("flat")
    cost = costs.standing_cost(
        m, target_height=0.0694, home_joint_qpos=np.asarray(m.key_qpos[0])[7:]
    )
    cfg = MPPIConfig(horizon=8, num_samples=32, n_substeps=2,
                     rollout_dt=0.004, noise_sigma=0.05)
    init, tick, run = make_mpc(m, cost, cfg, plant_substeps=10)
    carry = init(jax.random.PRNGKey(0), make_state(m, "home"))
    carry, traj = jax.jit(lambda c: run(c, 25))(carry)
    z = np.asarray(traj["qpos"][:, 2])
    assert abs(z[-1] - 0.0694) < 0.02, f"final height {z[-1]}"
    quat = np.asarray(carry.plant.qpos[3:7])
    assert abs(quat[0]) > 0.98  # still upright


def test_mppi_tracking_moves_forward_go1():
    """BASELINE config 2 (miniaturised): trot-tracking MPPI on the 12-DoF
    Go1 produces sustained forward motion without falling."""
    m = load_go1("flat")
    p = costs.TrackingCostParams(desired_vel_xy=(0.4, 0.0),
                                 target_height=0.265)
    cost = costs.tracking_cost(m, p, np.asarray(m.key_qpos[0])[7:])
    cfg = MPPIConfig(horizon=10, num_samples=48, n_substeps=2,
                     rollout_dt=0.005, noise_sigma=0.12, temperature=0.2)
    init, tick, run = make_mpc(m, cost, cfg, plant_substeps=10)
    carry = init(jax.random.PRNGKey(1), make_state(m, "home"))
    carry, traj = jax.jit(lambda c: run(c, 50))(carry)  # 1 s of control
    x = np.asarray(traj["qpos"][:, 0])
    z = np.asarray(traj["qpos"][:, 2])
    assert x[-1] > 0.05, f"no forward progress: x={x[-1]:.3f}"
    assert np.all(z > 0.12), f"fell: min z {z.min():.3f}"
    # effective sample size should show a non-degenerate distribution
    ess = np.asarray(traj["ess"])
    assert ess.mean() > 1.5


def test_realtime_controller_pipelined_ticks():
    """The pipelined host-loop bridge (bench.py's 50 Hz p99 path): lag-1
    ticks return valid in-range controls, the pipeline drains cleanly, and
    bridge mode accepts a measured (qpos, qvel) state."""
    m = load_opendog("flat")
    cost = costs.standing_cost(
        m, target_height=0.0694, home_joint_qpos=np.asarray(m.key_qpos[0])[7:]
    )
    cfg = MPPIConfig(horizon=4, num_samples=16, n_substeps=1,
                     rollout_dt=0.01, noise_sigma=0.05)
    rtc = RealtimeController(m, cost, cfg, lag=1, plant_substeps=2)
    rtc.start(make_state(m, "home"))
    lo = np.asarray(m.actuator_ctrlrange)[:, 0]
    hi = np.asarray(m.actuator_ctrlrange)[:, 1]

    # tick 0 returns the key_ctrl placeholder (pipeline not yet primed);
    # every tick after that returns the (t-1)-tick solve result
    ctrls = [rtc.tick() for _ in range(5)]
    for c in ctrls:
        assert c.shape == (m.nu,)
        assert np.all(np.isfinite(c))
        assert np.all(c >= lo - 1e-5) and np.all(c <= hi + 1e-5)
    final = rtc.drain()
    assert np.all(np.isfinite(final))

    # bridge mode: external measured state in, lagged ctrl out
    rtc2 = RealtimeController(m, cost, cfg, lag=1)
    st = make_state(m, "home")
    qpos, qvel = np.asarray(st.qpos), np.asarray(st.qvel)
    for t in range(3):
        c = rtc2.bridge_tick(qpos, qvel, t * 0.02)
        assert c.shape == (m.nu,)
        assert np.all(np.isfinite(c))


def test_trot_cost_desired_yaw_turns_preference():
    """TrotCostParams.desired_yaw (the TurnEnvironment analog): a state
    already rotated to the target yaw must cost less than heading zero,
    and the wrap-around difference is used (no 2*pi cliff)."""
    import jax.numpy as jnp

    from opendog_tpu.physics import State, spatial

    m = load_go1("flat")
    hj = np.asarray(m.key_qpos[0])[7:]
    p = costs.TrotCostParams(desired_yaw=np.pi / 2, w_heading=10.0)
    cost = costs.trot_cost(m, p, hj, legs="go1")
    qpos0 = jnp.asarray(m.key_qpos[0])

    def with_yaw(yaw):
        quat = jnp.array([jnp.cos(yaw / 2), 0.0, 0.0, jnp.sin(yaw / 2)])
        return State(qpos=qpos0.at[3:7].set(quat),
                     qvel=jnp.zeros(m.nv), time=jnp.zeros(()))

    u = jnp.asarray(m.key_ctrl[0])
    c_target = float(cost(with_yaw(jnp.pi / 2), u, u))
    c_zero = float(cost(with_yaw(0.0), u, u))
    assert c_target < c_zero
    # wrap-around: yaw = target + 2*pi costs the same as the target
    c_wrap = float(cost(with_yaw(jnp.pi / 2 + 2 * jnp.pi), u, u))
    np.testing.assert_allclose(c_wrap, c_target, rtol=1e-4, atol=1e-4)


def test_mpc_ctrl_lag_pipeline_semantics():
    """ctrl_lag=k simulates the deployment pipeline on-device: the first k
    ticks apply the hold control, and tick k applies the solve computed
    from the INITIAL state — i.e. exactly the lag-0 run's first control
    (same PRNG stream, same state)."""
    m = load_opendog("flat")
    cost = costs.standing_cost(
        m, target_height=0.0694, home_joint_qpos=np.asarray(m.key_qpos[0])[7:]
    )
    cfg = MPPIConfig(horizon=4, num_samples=16, n_substeps=1,
                     rollout_dt=0.01, noise_sigma=0.05)
    lo = np.asarray(m.actuator_ctrlrange)[:, 0]
    hi = np.asarray(m.actuator_ctrlrange)[:, 1]
    hold = np.clip(np.asarray(m.key_ctrl[0]), lo, hi)

    init0, _, run0 = make_mpc(m, cost, cfg, plant_substeps=2, ctrl_lag=0)
    init2, _, run2 = make_mpc(m, cost, cfg, plant_substeps=2, ctrl_lag=2)
    c0 = init0(jax.random.PRNGKey(7), make_state(m, "home"))
    c2 = init2(jax.random.PRNGKey(7), make_state(m, "home"))
    _, t0 = jax.jit(lambda c: run0(c, 4))(c0)
    _, t2 = jax.jit(lambda c: run2(c, 4))(c2)
    ctrl0 = np.asarray(t0["ctrl"])
    ctrl2 = np.asarray(t2["ctrl"])
    np.testing.assert_allclose(ctrl2[0], hold, atol=1e-6)
    np.testing.assert_allclose(ctrl2[1], hold, atol=1e-6)
    # tick 2 applies solve(state_0) == the lag-0 run's first control
    np.testing.assert_allclose(ctrl2[2], ctrl0[0], rtol=1e-5, atol=1e-6)

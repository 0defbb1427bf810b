"""Command-conditioned MPC + distillation (BASELINE config 5 "velocity-
command curriculum"; VERDICT r3 item 1).

``costs.trot_cost_cmd`` binds the commanded (vx, vy, yaw_target) at
runtime; ``mppi.make_solver(with_command=True)`` threads it to every
rollout cost; ``make_distiller(command_dim=3)`` gives the student the
command as an observation.  Mirrors the reference's per-reset randomized
desired velocity (environments/WalkEnvironment.py:138-151).
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from opendog_tpu.assets import load_go1
from opendog_tpu.physics import State, make_state
from opendog_tpu.solvers import MPPIConfig, costs, mppi


def _setup():
    m = load_go1("flat")
    home_j = np.asarray(m.key_qpos[0])[7:]
    pc = costs.TrotCostParams(desired_vel_xy=(0.5, 0.0),
                              target_height=0.265)
    return m, home_j, costs.trot_cost_cmd(m, pc, home_j, legs="go1")


def test_cmd_cost_scales_gait_with_speed():
    """At cmd=0 the gait reference collapses to the home posture (stand,
    don't march): the home pose costs less than a marching pose; at
    nominal speed the marching pose is the cheap one mid-swing."""
    m, home_j, cost = _setup()
    qpos_home = jnp.asarray(m.key_qpos[0])
    march = np.asarray(qpos_home).copy()
    # swing pair's knees flexed as the nominal gait would at peak swing
    march[7 + np.array([2, 11])] += -0.35
    u = jnp.asarray(m.key_ctrl[0])
    t = jnp.asarray(0.1)  # peak of pair-A swing (period 0.4)
    stand_cmd = jnp.zeros(3)
    trot_cmd = jnp.array([0.5, 0.0, 0.0])

    def c(q, cmd):
        return float(cost(State(qpos=jnp.asarray(q), qvel=jnp.zeros(m.nv),
                                time=t), u, u, cmd))

    assert c(qpos_home, stand_cmd) < c(march, stand_cmd)
    assert c(march, trot_cmd) < c(qpos_home, trot_cmd)


def test_cmd_cost_tracks_heading():
    m, home_j, cost = _setup()
    st = make_state(m, "home")
    u = jnp.asarray(m.key_ctrl[0])
    # zero yaw state: heading cost grows with commanded yaw target
    c0 = float(cost(st, u, u, jnp.array([0.0, 0.0, 0.0])))
    c1 = float(cost(st, u, u, jnp.array([0.0, 0.0, 0.5])))
    assert c1 > c0


def test_with_command_solver_is_command_sensitive():
    m, home_j, cost = _setup()
    cfg = MPPIConfig(horizon=4, num_samples=16, n_substeps=1,
                     rollout_dt=0.01, engine="xla")
    solve = jax.jit(mppi.make_solver(m, cost, cfg, with_command=True))
    s0 = make_state(m, "home")
    ms = mppi.init_state(m, cfg)
    k = jax.random.PRNGKey(0)
    c1, _, _ = solve(s0, ms, k, jnp.array([0.5, 0.0, 0.0]))
    c2, _, _ = solve(s0, ms, k, jnp.array([0.0, 0.0, 0.6]))
    assert float(jnp.abs(c1 - c2).max()) > 1e-4
    assert np.isfinite(np.asarray(c1)).all()


def test_with_command_sharded_matches_single_device(devices8):
    """The command must thread through the shard_map path identically."""
    m, home_j, cost = _setup()
    cfg = MPPIConfig(horizon=3, num_samples=16, n_substeps=1,
                     rollout_dt=0.01, engine="xla")
    s0 = make_state(m, "home")
    ms = mppi.init_state(m, cfg)
    k = jax.random.PRNGKey(3)
    cmd = jnp.array([0.3, 0.0, 0.2])
    c1, n1, _ = jax.jit(mppi.make_solver(m, cost, cfg, with_command=True))(
        s0, ms, k, cmd)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("mp",))
    cN, nN, _ = jax.jit(mppi.make_solver(m, cost, cfg, mesh=mesh,
                                         with_command=True))(s0, ms, k, cmd)
    np.testing.assert_allclose(np.asarray(cN), np.asarray(c1),
                               rtol=1e-5, atol=1e-5)


def test_anchored_solver_pulls_ctrl_toward_uref():
    """u_ref_fn + anchor_w prices plan deviation from the time-indexed
    gait reference: with a dominant anchor weight the solved action sits
    near u_ref(t0); with anchor_w = 0 the solver is exactly the plain
    one (pinned recipes stay bit-valid)."""
    m, home_j, cost = _setup()
    pc = costs.TrotCostParams(desired_vel_xy=(0.5, 0.0),
                              target_height=0.265)
    uref = costs.trot_gait_ref_cmd(m, pc, home_j, legs="go1")
    cfg = MPPIConfig(horizon=4, num_samples=64, n_substeps=1,
                     rollout_dt=0.01, engine="xla")
    s0 = make_state(m, "home")
    ms = mppi.init_state(m, cfg)
    k = jax.random.PRNGKey(0)
    cmd = jnp.array([0.5, 0.0, 0.0])
    plain = jax.jit(mppi.make_solver(m, cost, cfg, with_command=True))
    hard = jax.jit(mppi.make_solver(m, cost, cfg, with_command=True,
                                    u_ref_fn=uref, anchor_w=1e4))

    def iterate(solve, n=25):
        # candidates sample around the warm-started nominal (init = home
        # ctrl), so the anchor pulls the plan toward the reference over
        # REPEATED solves; advance time with the receding shift so the
        # warm start stays aligned with the time-indexed reference
        st, key = ms, k
        for i in range(n):
            key, sub = jax.random.split(key)
            s_t = State(qpos=s0.qpos, qvel=s0.qvel,
                        time=jnp.float32(i * 0.01))
            c, st, _ = solve(s_t, st, sub, cmd)
        return c, s_t.time

    c_plain, t_last = iterate(plain)
    c_hard, _ = iterate(hard)
    ref_last = uref(t_last, cmd)
    # dominant anchor: solved action converges onto the reference (up to
    # best-candidate sampling noise); the free solve settles wherever its
    # rollout cost prefers
    d_hard = float(jnp.abs(c_hard - ref_last).mean())
    d_plain = float(jnp.abs(c_plain - ref_last).mean())
    assert d_hard < 0.5 * d_plain
    assert d_hard < 0.06
    # anchor_w = 0 with a u_ref_fn is the exact plain solver
    c_plain1, _, _ = plain(s0, ms, k, cmd)
    off = jax.jit(mppi.make_solver(m, cost, cfg, with_command=True,
                                   u_ref_fn=uref, anchor_w=0.0))
    c_off, _, _ = off(s0, ms, k, cmd)
    np.testing.assert_array_equal(np.asarray(c_off), np.asarray(c_plain1))


def test_anchored_sharded_matches_single_device(devices8):
    m, home_j, cost = _setup()
    pc = costs.TrotCostParams(desired_vel_xy=(0.5, 0.0),
                              target_height=0.265)
    uref = costs.trot_gait_ref_cmd(m, pc, home_j, legs="go1")
    cfg = MPPIConfig(horizon=3, num_samples=16, n_substeps=1,
                     rollout_dt=0.01, engine="xla")
    s0 = make_state(m, "home")
    ms = mppi.init_state(m, cfg)
    k = jax.random.PRNGKey(3)
    cmd = jnp.array([0.3, 0.0, 0.2])
    c1, _, _ = jax.jit(mppi.make_solver(
        m, cost, cfg, with_command=True, u_ref_fn=uref, anchor_w=3.0))(
        s0, ms, k, cmd)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("mp",))
    cN, _, _ = jax.jit(mppi.make_solver(
        m, cost, cfg, mesh=mesh, with_command=True, u_ref_fn=uref,
        anchor_w=3.0))(s0, ms, k, cmd)
    np.testing.assert_allclose(np.asarray(cN), np.asarray(c1),
                               rtol=1e-5, atol=1e-5)


def test_distiller_command_dim_round_and_eval():
    from opendog_tpu.rl.distill import DistillConfig, make_distiller
    from opendog_tpu.rl.networks import MLPActorCritic

    m, home_j, cost = _setup()
    cfg = MPPIConfig(horizon=3, num_samples=8, n_substeps=1,
                     rollout_dt=0.01, engine="xla")
    obs_fn = lambda qp, qv, t: jnp.concatenate([qp[2:], qv])
    net = MLPActorCritic(action_dim=m.nu, hidden=(16, 16))
    S = 2
    dcfg = DistillConfig(num_scenarios=S, rollout_ticks=3, batch_size=8,
                         epochs_per_round=1)
    dist = make_distiller(m, cost, obs_fn, net, mppi_config=cfg,
                          config=dcfg, plant_substeps=5, command_dim=3)
    s0 = make_state(m, "home")
    plants = State(qpos=jnp.tile(s0.qpos[None], (S, 1)),
                   qvel=jnp.zeros((S, m.nv)), time=jnp.zeros(S))
    cmds = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.3]])
    dstate = dist.init(jax.random.PRNGKey(0), s0)
    # the student observes the command: obs width includes +3
    in_dim = dstate.params["params"]["Dense_0"]["kernel"].shape[0]
    base = (m.nq - 2) + m.nv
    assert in_dim == base + 3  # obs + command (no prev_ctrl here)
    dstate, plants, metrics = jax.jit(dist.round_fn, static_argnums=2)(
        dstate, plants, 0, None, cmds)
    assert np.isfinite(float(metrics["distill_loss"]))
    ev = jax.jit(dist.eval_fn, static_argnums=2)(dstate, plants, 2, None,
                                                 cmds)
    assert np.isfinite(np.asarray(ev["qpos_traj"])).all()


def test_cmd_stride_scales_laws():
    """The per-leg stride-scale helper: legacy linear law bit-compatible
    at defaults, calibrated affine law boosts slow commands, exact stand,
    and the turn differential signs per leg layout."""
    pc0 = costs.TrotCostParams(desired_vel_xy=(0.5, 0.0))
    v_nom = 0.5
    side = costs._side_signs("go1")
    # defaults: scalar linear scale broadcast per leg
    s = costs._cmd_stride_scales(pc0, v_nom, side, jnp.array([0.25, 0, 0]))
    np.testing.assert_allclose(np.asarray(s), 0.5, rtol=1e-5)
    # calibrated affine law: slow command strides MORE than linear
    pc1 = pc0._replace(amp_v0=0.16)
    s1 = costs._cmd_stride_scales(pc1, v_nom, side, jnp.array([0.25, 0, 0]))
    assert float(s1[0]) > 0.6
    # stand at cmd 0 in both laws (up to the sqrt grad-safety epsilon)
    for pc in (pc0, pc1):
        s0 = costs._cmd_stride_scales(pc, v_nom, side, jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(s0), 0.0, atol=5e-6)
    # turn differential: +yaw target strides RIGHT legs (FR, RR) longer
    pc2 = pc1._replace(turn_gain=1.2)
    st = costs._cmd_stride_scales(pc2, v_nom, side,
                                  jnp.array([0.0, 0.0, 0.5]))
    st = np.asarray(st)  # go1 order FR, FL, RR, RL
    assert st[0] > 0 and st[2] > 0      # right side forward
    assert st[1] < 0 and st[3] < 0      # left side backward
    # opendog layout FL, FR, BL, BR: left legs are indices 0, 2
    sd = np.asarray(costs._side_signs("opendog"))
    assert (sd == np.array([-1.0, 1.0, -1.0, 1.0])).all()


def test_ref_takes_cmd_convention():
    m, home_j, _ = _setup()
    pc = costs.TrotCostParams()
    assert costs.ref_takes_cmd(
        costs.trot_gait_ref_cmd(m, pc, home_j, legs="go1"))
    assert not costs.ref_takes_cmd(
        costs.trot_gait_ref(m, pc, home_j, legs="go1"))

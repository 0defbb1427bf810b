"""Contact-scheduled whole-body iLQR (BASELINE config 3: "iLQR MPC with
contact schedule").

The schedule interface is ``costs.ContactSchedule`` (explicit per-leg
stance/swing slots); iLQR threads stage time through the horizon
(solvers/ilqr.py), so one solve optimises through the full stance/swing
sequence.  Phase semantics for the landing schedule follow the reference's
front-then-back landing phases
(rewards/landing_environment_reward_calc.py:107-135).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendog_tpu.assets import load_go1, load_opendog
from opendog_tpu.physics import State, dynamics, make_state
from opendog_tpu.solvers import costs
from opendog_tpu.solvers.ilqr import ILQRConfig, make_ilqr


def _posed_state(m, joints, t=0.0):
    qpos = jnp.asarray(m.key_qpos[0]).at[7:].set(jnp.asarray(joints))
    return State(qpos=qpos, qvel=jnp.zeros(m.nv), time=jnp.asarray(t))


def test_trot_schedule_table():
    pc = costs.TrotCostParams(thigh_amp=0.2, period_s=0.4)
    s = costs.trot_schedule(pc, legs="go1")
    stance = np.asarray(s.stance)
    # two slots, diagonal pairs alternate: FR,RL swing in slot 0
    assert stance.shape == (2, 4)
    np.testing.assert_allclose(stance[0], [0, 1, 1, 0])
    np.testing.assert_allclose(stance[1], [1, 0, 0, 1])
    assert s.slot_dt == pytest.approx(0.2)
    # thigh offsets alternate sign (triangle-wave fore-aft swing)
    off = np.asarray(s.thigh_offset)
    np.testing.assert_allclose(off[0], -off[1])


def test_schedule_cost_cyclic_wrap_and_clamp():
    m = load_go1("flat")
    home_j = np.asarray(m.key_qpos[0])[7:]
    pc = costs.TrotCostParams()
    cyc = costs.contact_schedule_cost(
        m, costs.trot_schedule(pc, legs="go1"), pc, home_j, legs="go1")
    st = _posed_state(m, home_j, t=0.07)
    u = jnp.asarray(m.key_ctrl[0])
    c0 = float(cyc(st, u, u))
    c1 = float(cyc(st.replace(time=st.time + pc.period_s), u, u))
    assert c0 == pytest.approx(c1, rel=1e-5)  # cyclic: exact period wrap
    # non-cyclic landing schedule clamps at the final all-stance slot
    land = costs.contact_schedule_cost(
        m, costs.landing_schedule(0.2), pc, home_j, legs="go1")
    cA = float(land(st.replace(time=jnp.asarray(10.0)), u, u))
    cB = float(land(st.replace(time=jnp.asarray(100.0)), u, u))
    assert cA == pytest.approx(cB, rel=1e-6)


def test_schedule_cost_prefers_scheduled_pose():
    """A pose matching the schedule's swing-knee reference must cost less
    than the mirrored (wrong-diagonal) pose at the same time."""
    m = load_go1("flat")
    home_j = np.asarray(m.key_qpos[0])[7:]
    pc = costs.TrotCostParams(knee_lift=0.3, thigh_amp=0.0)
    sched = costs.trot_schedule(pc, legs="go1")
    cost = costs.contact_schedule_cost(m, sched, pc, home_j, legs="go1",
                                       w_stance_vel=0.0)
    knee_idx = np.array([2, 5, 8, 11])
    # mid-slot 0: FR,RL in swing (stance row [0,1,1,0])
    t = 0.5 * sched.slot_dt
    right = home_j.copy()
    right[knee_idx] += -0.3 * np.array([1.0, 0.0, 0.0, 1.0])
    wrong = home_j.copy()
    wrong[knee_idx] += -0.3 * np.array([0.0, 1.0, 1.0, 0.0])
    u = jnp.asarray(m.key_ctrl[0])
    c_right = float(cost(_posed_state(m, right, t), u, u))
    c_wrong = float(cost(_posed_state(m, wrong, t), u, u))
    assert c_right < c_wrong


def test_scheduled_ilqr_solves_and_is_phase_indexed():
    """iLQR with a contact-scheduled cost must (a) reduce the cost and
    (b) produce phase-dependent plans: solving from one slot later yields
    different controls (stage-time threading, solvers/ilqr.py)."""
    m = load_opendog("flat")
    home_j = np.asarray(m.key_qpos[0])[7:]
    hj = home_j.copy()
    hj[[0, 2, 4, 6]] = 2.58
    hj[[1, 3, 5, 7]] = -1.5
    pc = costs.TrotCostParams(desired_vel_xy=(0.28, 0.0),
                              target_height=0.0703, thigh_amp=0.22,
                              knee_lift=0.12, w_height=80.0)
    sched = costs.trot_schedule(pc, legs="opendog")
    cost = costs.contact_schedule_cost(m, sched, pc, hj, legs="opendog")
    cfg = ILQRConfig(horizon=6, n_substeps=2, rollout_dt=0.01, iterations=2)
    solve = jax.jit(make_ilqr(m, cost, cfg))
    st = make_state(m, "home")
    st, _ = dynamics.step(m, st, jnp.asarray(m.key_ctrl[0]), None,
                          n_substeps=200)
    U0 = jnp.tile(jnp.asarray(m.key_ctrl[0])[None], (cfg.horizon, 1))
    U, X, stats = solve(st, U0)
    assert float(stats["cost"]) < float(stats["initial_cost"])
    assert np.isfinite(np.asarray(U)).all()
    U2, _, _ = solve(st.replace(time=st.time + sched.slot_dt), U0)
    assert float(jnp.abs(U - U2).max()) > 1e-3


@pytest.mark.skipif(
    __import__("os").environ.get("OPENDOG_SLOW_TESTS") != "1",
    reason="minutes-long go1 CPU compile; set OPENDOG_SLOW_TESTS=1")
def test_scheduled_trot_multicycle_z_band():
    """Gait-STABILITY regression guard (VERDICT r4 item 2): the bench-3b
    scheduled trot tracked for 10 replan cycles (5 s) on the CPU plant
    must hold the trunk z band with margin — the r4 TPU regression (a
    crouched march at z 0.141) had no test between bench windows because
    the suite only pinned schedule tables and solve improvement, never
    multi-cycle gait health.

    Root cause + fix are documented at make_ilqr_tracker: plan at the
    plant's 2 ms integration rate (a 10 ms plan integrator is model
    mismatch through contact — the old config collapses to z 0.06 under
    this very harness's compilation flags) and warm-start each solve
    from the gait reference.  Measured with the fix (CPU f32, 8-virtual-
    device flags): z stays 0.22-0.27 through 10 cycles, plan-plant gap
    ~0.000."""
    from opendog_tpu.solvers.mpc import make_ilqr_tracker

    m = load_go1("flat")
    home_j = np.asarray(m.key_qpos[0])[7:]
    pc = costs.TrotCostParams(desired_vel_xy=(0.5, 0.0),
                              target_height=0.265)
    sched = costs.trot_schedule(pc, legs="go1")
    cost = costs.contact_schedule_cost(m, sched, pc, home_j, legs="go1")
    icfg = ILQRConfig(horizon=25, n_substeps=10, rollout_dt=0.002,
                      iterations=6)
    u_ref = costs.trot_gait_ref(m, pc, home_j, legs="go1")
    cycle = jax.jit(make_ilqr_tracker(m, cost, icfg, track_ticks=25,
                                      plant_substeps=10, u_ref_fn=u_ref))
    s = make_state(m, "home")
    s, _ = dynamics.step(m, s, jnp.asarray(m.key_ctrl[0]), None,
                         n_substeps=200)
    s = s.replace(time=jnp.zeros(()))
    U = jnp.tile(jnp.asarray(m.key_ctrl[0])[None], (icfg.horizon, 1))
    plant, U, traj = cycle(s, U)
    x0 = float(np.asarray(plant.qpos)[0])
    zs = [np.asarray(traj["qpos"])[:, 2]]
    for _ in range(9):
        plant, U, traj = cycle(plant, U)
        zs.append(np.asarray(traj["qpos"])[:, 2])
    allz = np.concatenate(zs)
    q = np.asarray(plant.qpos)
    assert allz.min() > 0.15, f"z_min {allz.min():.3f} — belly-flop class"
    assert 0.20 < zs[-1].mean() < 0.35, \
        f"last-cycle z mean {zs[-1].mean():.3f} — crouched-march class"
    assert q[0] - x0 > 0.8, f"distance {q[0] - x0:.3f} m — stopped trotting"


def test_walk_trot_schedule_table():
    """duty=0.625 walk-trot: 8 slots, two quadruple-support slots, and
    each leg's thigh triangle sweeps -amp -> +amp across its 3 swing
    slots then strokes back through stance; duty=0.5 stays byte-exact
    with the legacy 2-slot table (pinned elsewhere)."""
    pc = costs.TrotCostParams(thigh_amp=0.2, period_s=0.4)
    s8 = costs.trot_schedule(pc, "go1", duty=0.625)
    st = np.asarray(s8.stance)
    assert st.shape == (8, 4)
    assert [k for k in range(8) if st[k].sum() == 4] == [3, 7]
    assert np.isclose(s8.slot_dt, 0.05)
    off = np.asarray(s8.thigh_offset)
    # FR (pair A) swings slots 0-2: -amp at slot0, +amp at slot3
    assert np.isclose(off[0, 0], -0.2) and np.isclose(off[3, 0], 0.2)
    # FL (pair B) runs the same triangle 4 slots later
    assert np.allclose(off[:, 1], np.roll(off[:, 0], 4))
    with pytest.raises(ValueError):
        costs.trot_schedule(pc, "go1", duty=0.9)

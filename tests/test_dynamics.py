import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendog_tpu.assets import load_go1, load_opendog
from opendog_tpu.physics import State, dynamics, load_model, make_state

PENDULUM = """
<mujoco>
  <option gravity="0 0 -9.81" timestep="0.001"/>
  <worldbody>
    <body name="link" pos="0 0 1">
      <inertial mass="1" pos="0 0 -0.5" diaginertia="1e-6 1e-6 1e-6"/>
      <joint name="pivot" type="hinge" axis="0 1 0" pos="0 0 0"/>
    </body>
  </worldbody>
</mujoco>
"""


def _settle(model, n_ctrl_steps=50, substeps=10):
    state = make_state(model, "home")
    ctrl = model.key_ctrl[0]
    step = jax.jit(lambda s: dynamics.step(model, s, ctrl, n_substeps=substeps))
    traj = []
    for _ in range(n_ctrl_steps):
        state, info = step(state)
        traj.append(np.asarray(state.qpos))
    return np.array(traj), state, info


def test_pendulum_period_and_energy():
    """Point-mass pendulum: period matches 2*pi*sqrt(L/g) and energy is
    conserved to <1% over two periods (no damping/friction)."""
    m = load_model(PENDULUM)
    state = State(
        qpos=jnp.array([0.1]), qvel=jnp.zeros(1), time=jnp.zeros(())
    )
    step = jax.jit(
        lambda s: dynamics.step(m, s, jnp.zeros(0), n_substeps=10)
    )
    qs = []
    for _ in range(420):  # 4.2 s at dt=0.01 per control step
        state, _ = step(state)
        qs.append(float(state.qpos[0]))
    qs = np.array(qs)
    # small-angle period: 2 pi sqrt(0.5/9.81) = 1.419 s
    crossings = np.where((qs[:-1] > 0) & (qs[1:] <= 0))[0]
    assert len(crossings) >= 2
    period = (crossings[1] - crossings[0]) * 0.01
    assert abs(period - 1.419) < 0.05
    # amplitude decay <1% over the window
    assert np.max(np.abs(qs[-200:])) > 0.99 * 0.1


def test_freefall_acceleration():
    """With no ground, the base must accelerate at exactly -g."""
    m = load_opendog("none")
    s = make_state(m, "home")
    ctrl = m.key_ctrl[0]
    qvel2, _ = dynamics.forward(m, s.qpos, s.qvel, ctrl, dt=m.timestep)
    qacc = np.asarray((qvel2 - s.qvel) / m.timestep)
    assert abs(qacc[2] + 9.81) < 0.2
    assert abs(qacc[0]) < 0.2 and abs(qacc[1]) < 0.2


def test_opendog_settle_matches_mujoco_golden():
    """Golden-trajectory parity: standing at the home keyframe settles to the
    same equilibrium as reference MuJoCo (tests/golden/opendog_settle.npz,
    generated from the reference our_robot.xml + plane scene)."""
    gold = np.load("tests/golden/opendog_settle.npz")["qpos"]
    m = load_opendog("flat")
    traj, state, info = _settle(m)
    # final trunk height within 3 mm (MuJoCo equilibrium 0.0704)
    assert abs(traj[-1][2] - gold[-1][2]) < 3e-3
    # joint angles within 0.01 rad
    np.testing.assert_allclose(traj[-1][7:], gold[-1][7:], atol=1e-2)
    # transient: trunk height at 0.2 s and 0.4 s within 1 cm
    assert abs(traj[9][2] - gold[99][2]) < 1e-2
    assert abs(traj[19][2] - gold[199][2]) < 1e-2


def test_go1_settle_matches_mujoco_golden():
    gold = np.load("tests/golden/go1_settle.npz")["qpos"]
    m = load_go1("flat")
    traj, state, info = _settle(m)
    assert abs(traj[-1][2] - gold[-1][2]) < 3e-3
    np.testing.assert_allclose(traj[-1][7:], gold[-1][7:], atol=1e-2)


def test_standing_contact_forces_support_weight():
    m = load_opendog("flat")
    _, state, info = _settle(m)
    fw, fb, ic = dynamics.foot_contact_summary(m, info.contact)
    total_fz = float(np.sum(np.asarray(fw)[:, 2]))
    weight = float(np.sum(np.asarray(m.body_mass))) * 9.81
    assert abs(total_fz - weight) / weight < 0.05
    assert bool(np.all(np.asarray(ic)))


def test_batched_step_matches_single():
    """vmap over a batch of envs is the DP axis of the engine — batched
    results must equal the single-env path bitwise-ish."""
    m = load_opendog("flat")
    s = make_state(m, "home")
    ctrl = m.key_ctrl[0]
    batch = 4
    qpos = jnp.tile(s.qpos[None], (batch, 1))
    qvel = jnp.tile(s.qvel[None], (batch, 1))
    states = State(qpos=qpos, qvel=qvel, time=jnp.zeros(batch))
    ctrls = jnp.tile(ctrl[None], (batch, 1))
    vstep = jax.jit(
        jax.vmap(lambda st, c: dynamics.step(m, st, c, n_substeps=5)[0])
    )
    out = vstep(states, ctrls)
    single, _ = jax.jit(lambda: dynamics.step(m, s, ctrl, n_substeps=5))()
    np.testing.assert_allclose(
        np.asarray(out.qpos[0]), np.asarray(single.qpos), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.qpos[0]), np.asarray(out.qpos[3]), rtol=1e-6
    )


def test_jump_scene_box_contact():
    """A foot sphere dropped over the jump-scene cube must land on top of it."""
    m = load_go1("jump")
    s = make_state(m, "home")
    # move the robot over the cube (x=1) and drop from above
    qpos = s.qpos.at[0].set(1.0).at[2].set(0.6)
    state = State(qpos=qpos, qvel=s.qvel, time=jnp.zeros(()))
    ctrl = m.key_ctrl[0]
    step = jax.jit(lambda st: dynamics.step(m, st, ctrl, n_substeps=10))
    for _ in range(60):
        state, info = step(state)
    # cube top is at z=0.18; trunk must settle well above the cube top
    z = float(state.qpos[2])
    assert 0.18 < z < 0.6
    assert float(state.qpos[2]) > 0.3  # standing on the cube, not the floor


def test_mass_matrix_positive_definite():
    m = load_go1("flat")
    s = make_state(m, "home")
    xpos, xquat = dynamics.fk(m, s.qpos)
    S = dynamics.motion_subspace(m, xpos, xquat, xpos[0])
    I_O = dynamics._spatial_inertias(m, xpos, xquat, xpos[0])
    M = np.asarray(dynamics.mass_matrix(m, S, I_O))
    np.testing.assert_allclose(M, M.T, atol=1e-5)
    w = np.linalg.eigvalsh(M)
    assert w.min() > 0
    # total mass appears in the translational block
    np.testing.assert_allclose(
        M[:3, :3], np.eye(3) * float(np.sum(np.asarray(m.body_mass))), atol=1e-3
    )


@pytest.mark.skipif(
    not __import__("importlib").util.find_spec("mujoco"),
    reason="mujoco oracle not available",
)
def test_cross_check_smooth_dynamics_vs_mujoco():
    """Oracle test: with no contact (robot high in the air) our step must
    track MuJoCo on the same generated XML for 0.2 s under a sine control."""
    import mujoco

    from opendog_tpu.assets.opendog import opendog_xml

    xml = opendog_xml("none")
    mm = mujoco.MjModel.from_xml_string(xml)
    dd = mujoco.MjData(mm)
    mujoco.mj_resetDataKeyframe(mm, dd, 0)
    dd.qpos[2] = 2.0

    m = load_opendog("none")
    s = make_state(m, "home")
    state = State(qpos=s.qpos.at[2].set(2.0), qvel=s.qvel, time=jnp.zeros(()))

    home_ctrl = np.asarray(m.key_ctrl[0])
    step = jax.jit(lambda st, c: dynamics.step(m, st, c, n_substeps=1))
    for i in range(100):
        ctrl = home_ctrl + 0.2 * np.sin(2 * np.pi * i / 50.0) * np.array(
            [1, -1] * 4
        )
        dd.ctrl[:] = ctrl
        mujoco.mj_step(mm, dd)
        state, _ = step(state, jnp.asarray(ctrl, dtype=jnp.float32))
    ours = np.asarray(state.qpos)
    # frictionloss modelling differs (constraint vs smooth) -> loose tolerance
    np.testing.assert_allclose(ours[7:], dd.qpos[7:], atol=0.05)
    np.testing.assert_allclose(ours[:3], dd.qpos[:3], atol=0.01)


@pytest.mark.skipif(
    not __import__("importlib").util.find_spec("mujoco"),
    reason="mujoco oracle not available",
)
@pytest.mark.parametrize("robot", ["opendog", "go1"])
def test_mass_matrix_matches_mujoco_fullM(robot):
    """Oracle test on RANDOMIZED poses: CRBA must match mj_fullM entrywise.

    Regression guard for the free-base double-count bug: same-body dof
    pairs appear in both directions of the dof-ancestor mask, and the
    symmetrizing assembly counted the base 6x6 off-diagonals twice — an
    error invisible at settle equilibria (golden tests passed for weeks)
    but 2x on the trans-rot coupling at any randomized pose."""
    import mujoco

    if robot == "opendog":
        from opendog_tpu.assets.opendog import opendog_xml as xml_fn
        m = load_opendog("flat")
    else:
        from opendog_tpu.assets.go1 import go1_xml as xml_fn
        m = __import__("opendog_tpu.assets", fromlist=["load_go1"]).load_go1(
            "flat")
    mm = mujoco.MjModel.from_xml_string(xml_fn("flat"))
    dd = mujoco.MjData(mm)

    rng = np.random.default_rng(7)
    for trial in range(3):
        mujoco.mj_resetDataKeyframe(mm, dd, 0)
        dd.qpos[:3] += rng.normal(0, 0.02, 3)
        dd.qpos[7:] += rng.normal(0, 0.1, mm.nq - 7)
        mujoco.mj_forward(mm, dd)
        M_mj = np.zeros((mm.nv, mm.nv))
        mujoco.mj_fullM(mm, dd, M_mj)

        qp = jnp.asarray(dd.qpos, jnp.float32)
        xpos, xquat = dynamics.fk(m, qp)
        S = dynamics.motion_subspace(m, xpos, xquat, xpos[0])
        I_O = dynamics._spatial_inertias(m, xpos, xquat, xpos[0])
        M = np.asarray(dynamics.mass_matrix(m, S, I_O))
        # common-origin coords differ from mujoco's joint coords only in
        # the base rows/cols basis; armature diag is included in both
        np.testing.assert_allclose(M, M_mj, atol=2e-4)

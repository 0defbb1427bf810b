"""Golden gait-replay parity: the reference's *trained, deployed* gait
artifacts replayed through our engine vs. the MuJoCo oracle.

The reference's converged artifacts (``sim2real/best/walk_rl_sym_ep4600.json``,
``sim2real/walk.json`` — SURVEY §6) are the strongest available ground truth
for trajectory parity: both engines execute the same real-degree gait through
the same calibration map, and the resulting base + joint trajectories are
compared per gait step with quantitative RMSE bounds (BASELINE.md "match
reference joint trajectories within tolerance").

Measured parity on 2026-08-17 (CPU f32 vs MuJoCo 3.10 f64, recorded in
docs/PARITY.md):
  ep4600 (50 steps x 0.2 s): trunk x RMSE 5.0 mm, z RMSE 1.1 mm,
                             joint RMSE 3.3 mrad (max 31 mrad)
  walk.json (0.1 s steps):   trunk x RMSE 0.4 mm, z RMSE 1.2 mm,
                             joint RMSE 9.4 mrad (max 46 mrad)
The asserted bounds are ~3x the measured values to absorb platform noise
while staying in the same error class.
"""
import os
import tempfile
import textwrap

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendog_tpu.assets import load_opendog
from opendog_tpu.physics import dynamics, make_state
from opendog_tpu.sim2real import gait_json

REF_SIM2REAL = "/root/reference/Code/mujoco/sim2real"
REF_GAIT = os.path.join(REF_SIM2REAL, "best/walk_rl_sym_ep4600.json")
REF_WALK = os.path.join(REF_SIM2REAL, "walk.json")
REF_SCENE = "/root/reference/Code/mujoco/our_robot"


def _replay_ours(model, durations, ctrl_model, settle=100):
    """Replay a gait; returns per-gait-step qpos (T, nq)."""
    state = make_state(model, "home")
    hold = jnp.asarray(model.key_ctrl[0])
    state, _ = dynamics.step(model, state, hold, None, n_substeps=settle)
    step50 = jax.jit(lambda s, c: dynamics.step(model, s, c,
                                                n_substeps=50)[0])
    out = []
    for dur, ctrl in zip(durations, ctrl_model):
        n50 = max(1, int(round(dur / (model.timestep * 50))))
        for _ in range(n50):
            state = step50(state, jnp.asarray(ctrl))
        out.append(np.asarray(state.qpos))
    return np.asarray(out)


def _replay_mujoco(durations, ctrl_model, settle=100):
    """Same replay through the MuJoCo oracle; per-gait-step qpos (T, nq).
    Actuator order is identical by construction (same declaration order)."""
    mujoco = pytest.importorskip("mujoco")
    xml = f"""<mujoco model=\"scene\">
      <include file=\"{REF_SCENE}/our_robot.xml\"/>
      <compiler meshdir=\"{REF_SCENE}/assets\"/>
      <worldbody><geom name=\"floor\" type=\"plane\" size=\"0 0 .05\"/></worldbody>
    </mujoco>"""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "scene.xml")
        open(p, "w").write(textwrap.dedent(xml))
        mm = mujoco.MjModel.from_xml_path(p)
    dd = mujoco.MjData(mm)
    mujoco.mj_resetDataKeyframe(mm, dd, 0)
    dd.ctrl[:] = mm.key_ctrl[0]
    for _ in range(settle):
        mujoco.mj_step(mm, dd)
    out = []
    for dur, ctrl in zip(durations, ctrl_model):
        dd.ctrl[:] = ctrl
        for _ in range(int(round(dur / mm.opt.timestep))):
            mujoco.mj_step(mm, dd)
        out.append(dd.qpos.copy())
    return np.asarray(out)


def _rmse(a, b):
    return float(np.sqrt(np.mean(np.square(a - b))))


@pytest.mark.skipif(not os.path.exists(REF_GAIT),
                    reason="reference artifacts not mounted")
@pytest.mark.parametrize(
    "gait_path,x_tol,z_tol,j_tol,j_max",
    [
        (REF_GAIT, 0.015, 0.005, 0.010, 0.10),   # ep4600, 50 x 0.2 s
        (REF_WALK, 0.015, 0.005, 0.030, 0.15),   # deployed walk.json
    ],
    ids=["ep4600", "walk_json"],
)
def test_gait_trajectory_rmse_vs_oracle(gait_path, x_tol, z_tol, j_tol,
                                        j_max):
    """Per-gait-step trunk x/z and joint-angle RMSE vs the MuJoCo oracle
    must stay within the documented tolerance class."""
    if not os.path.exists(gait_path):
        pytest.skip("gait artifact not mounted")
    durations, targets_deg = gait_json.load_gait(gait_path)
    model = load_opendog("flat")
    ctrl_model = gait_json.gait_to_sim_ctrl(model, durations, targets_deg)
    q_ours = _replay_ours(model, durations, ctrl_model)
    q_mj = _replay_mujoco(durations, ctrl_model)

    assert np.all(np.isfinite(q_ours))
    # healthy band: never fully collapsed nor launched
    assert q_ours[:, 2].min() > 0.03 and q_ours[:, 2].max() < 0.25

    x_rmse = _rmse(q_ours[:, 0], q_mj[:, 0])
    z_rmse = _rmse(q_ours[:, 2], q_mj[:, 2])
    j_rmse = _rmse(q_ours[:, 7:], q_mj[:, 7:])
    j_peak = float(np.abs(q_ours[:, 7:] - q_mj[:, 7:]).max())
    assert x_rmse < x_tol, f"trunk x RMSE {x_rmse:.4f} m"
    assert z_rmse < z_tol, f"trunk z RMSE {z_rmse:.4f} m"
    assert j_rmse < j_tol, f"joint RMSE {j_rmse:.4f} rad"
    assert j_peak < j_max, f"joint peak {j_peak:.4f} rad"
    # same displacement direction at the gait end (or both ~static)
    same_dir = np.sign(q_ours[-1, 0]) == np.sign(q_mj[-1, 0])
    assert same_dir or abs(q_mj[-1, 0]) < 0.05


@pytest.mark.skipif(not os.path.exists(REF_SCENE),
                    reason="reference scene not mounted")
def test_sweep_winner_trot_parity_moves_meters():
    """Cross-engine parity on a gait with REAL displacement (VERDICT r3
    item 5): the round-3 sweep-winner trot reference (full-range thigh
    swing around mid-range, rl/distill_zoo defaults) replayed OPEN-LOOP at
    50 Hz for 10 s walks ~0.5 m in BOTH engines; trunk-x RMSE must stay a
    small fraction of the distance traveled.

    Measured 2026-08-19 (CPU f32 vs MuJoCo 3.10 f64): ours -0.529 m vs
    oracle -0.537 m, x RMSE 7.1 mm = 1.3% of displacement (75x margin),
    z RMSE 1.2 mm, joint RMSE 15 mrad."""
    from opendog_tpu.solvers import costs as costs_mod

    model = load_opendog("flat")
    home_j = np.asarray(model.key_qpos[0])[7:].copy()
    home_j[[0, 2, 4, 6]] = 2.58
    home_j[[1, 3, 5, 7]] = -1.5
    pc = costs_mod.TrotCostParams(
        desired_vel_xy=(0.28, 0.0), target_height=0.0703,
        thigh_amp=0.22, knee_lift=0.12, w_height=80.0)
    u_ref = costs_mod.trot_gait_ref(model, pc, home_j, legs="opendog")
    T = 500  # 10 s at 50 Hz
    ctrl = np.stack([np.asarray(u_ref(jnp.float32(t * 0.02)))
                     for t in range(T)])
    lo, hi = np.asarray(model.actuator_ctrlrange).T
    ctrl = np.clip(ctrl, lo, hi)
    # 50 Hz tick-level replay (not the gait-step-level helper): the trot
    # changes targets every 20 ms
    state = make_state(model, "home")
    state, _ = dynamics.step(model, state, jnp.asarray(model.key_ctrl[0]),
                             None, n_substeps=100)

    @jax.jit
    def replay(st, cs):
        def tick(s, c):
            s2, _ = dynamics.step(model, s, c, None, n_substeps=10)
            return s2, s2.qpos
        return jax.lax.scan(tick, st, cs)

    _, q_ours = replay(state, jnp.asarray(ctrl))
    q_ours = np.asarray(q_ours)

    mujoco = pytest.importorskip("mujoco")
    xml = f"""<mujoco model=\"scene\">
      <include file=\"{REF_SCENE}/our_robot.xml\"/>
      <compiler meshdir=\"{REF_SCENE}/assets\"/>
      <worldbody><geom name=\"floor\" type=\"plane\" size=\"0 0 .05\"/></worldbody>
    </mujoco>"""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "scene.xml")
        open(p, "w").write(textwrap.dedent(xml))
        mm = mujoco.MjModel.from_xml_path(p)
    dd = mujoco.MjData(mm)
    mujoco.mj_resetDataKeyframe(mm, dd, 0)
    dd.ctrl[:] = mm.key_ctrl[0]
    for _ in range(100):
        mujoco.mj_step(mm, dd)
    q_mj = []
    for c in ctrl:
        dd.ctrl[:] = c
        for _ in range(10):
            mujoco.mj_step(mm, dd)
        q_mj.append(dd.qpos.copy())
    q_mj = np.asarray(q_mj)

    dist = abs(float(q_mj[-1, 0]))
    assert dist > 0.3, f"oracle gait barely moved ({dist:.3f} m)"
    # same direction, comparable magnitude
    assert np.sign(q_ours[-1, 0]) == np.sign(q_mj[-1, 0])
    assert abs(q_ours[-1, 0] - q_mj[-1, 0]) < 0.15 * dist
    x_rmse = _rmse(q_ours[:, 0], q_mj[:, 0])
    assert x_rmse < 0.05 * dist, (
        f"x RMSE {x_rmse:.4f} m vs {dist:.3f} m traveled")
    assert _rmse(q_ours[:, 2], q_mj[:, 2]) < 0.005
    assert _rmse(q_ours[:, 7:], q_mj[:, 7:]) < 0.05


def test_designed_trot_replays_in_both_engines():
    """The scripted trot (sim2real/main.py parity) replayed through our
    engine stays healthy and ends near its starting height."""
    from opendog_tpu.sim2real.gait_designer import design_trot

    model = load_opendog("flat")
    durations, sim_ctrl_cal, real_deg = design_trot(model)
    ctrl_model = gait_json.gait_to_sim_ctrl(model, durations, real_deg)
    qs = _replay_ours(model, durations, ctrl_model)
    assert np.all(np.isfinite(qs[:, 0]))
    assert qs[:, 2].min() > 0.03


def test_distilled_gait_artifact_replays_healthy():
    """The MPC-distilled opendog gait export (runs/distill_opendog/
    walk_distilled.json, produced by scripts/distill_walk.py --robot
    opendog) must replay through the standard real-deg -> sim pipeline
    with forward progress and a healthy trunk height — the same deploy
    path as the reference's walk.json."""
    path = "runs/distill_opendog/walk_distilled.json"
    if not os.path.exists(path):
        pytest.skip("distilled gait artifact not present")
    durations, deg = gait_json.load_gait(path)
    model = load_opendog("flat")
    ctrl = gait_json.gait_to_sim_ctrl(model, durations, deg)
    state = make_state(model, "home")
    hold = jnp.asarray(model.key_ctrl[0])
    state, _ = dynamics.step(model, state, hold, None, n_substeps=150)
    step = jax.jit(lambda s, c: dynamics.step(model, s, c,
                                              n_substeps=10)[0])
    for c in ctrl:
        state = step(state, jnp.asarray(c))
    assert np.isfinite(np.asarray(state.qpos)).all()
    assert 0.04 < float(state.qpos[2]) < 0.12
    assert float(state.qpos[0]) > 0.02  # forward over the 2 s gait


@pytest.mark.skipif(not os.path.exists(REF_SCENE.replace("our_robot",
                                                         "unitree_go1")),
                    reason="reference scene not mounted")
def test_go1_cmd_trot_parity():
    """Go1 cross-engine parity row (VERDICT r4 item 5): the flagship
    bench/solver robot's command-gait trot replayed OPEN LOOP for 6 s at
    0.5 m/s in our engine (oracle-contact variant: the reference's own
    solimp + condim-6 foot semantics, assets.go1_oracle_contact) and in
    MuJoCo 3.10.

    Measured 2026-08-19 (CPU f32 vs MuJoCo f64): ours 2.628 m vs oracle
    2.518 m, trunk-x RMSE 69 mm = 2.74% of distance traveled, z RMSE
    9.1 mm, joint RMSE 8.0 mrad.  Bounds ~1.8x measured.  The crisp
    production contact measures 8.26% on the same protocol — the gap
    decomposition (touchdown slip, foot-pivot rolling friction, ride
    height) is documented at assets.go1_oracle_contact and in
    docs/PARITY.md."""
    mujoco = pytest.importorskip("mujoco")
    import tempfile as _tf

    from opendog_tpu.assets import go1_oracle_contact
    from opendog_tpu.rl.distill_zoo import cmd_distill_setup

    REF_GO1 = "/root/reference/Code/mujoco/unitree_go1"
    setup = cmd_distill_setup("go1", engine="xla")
    m = go1_oracle_contact(setup.model)
    cmd = jnp.asarray([0.5, 0.0, 0.0])
    lo, hi = np.asarray(m.actuator_ctrlrange).T
    T = 300
    ctrls = np.asarray(
        [np.clip(np.asarray(setup.u_ref(jnp.float32(k * 0.02), cmd)),
                 lo, hi) for k in range(T)], np.float32)

    state = make_state(m, "home")
    state, _ = dynamics.step(m, state, jnp.asarray(m.key_ctrl[0]), None,
                             n_substeps=200)
    state = state.replace(time=jnp.zeros(()))
    tick = jax.jit(lambda s, c: dynamics.step(m, s, c, None,
                                              n_substeps=10)[0])
    qs = []
    for k in range(T):
        state = tick(state, jnp.asarray(ctrls[k]))
        qs.append(np.asarray(state.qpos))
    q_ours = np.asarray(qs)

    # oracle: reference go1.xml ships referencing a trunk.stl it does not
    # include (visual-only; inertials explicit) — drop those two lines
    go1_src = "\n".join(
        ln for ln in open(os.path.join(REF_GO1, "go1.xml")).read()
        .splitlines()
        if "trunk.stl" not in ln and 'mesh="trunk"' not in ln)
    scene = """<mujoco model="scene">
      <include file="go1.xml"/>
      <worldbody><geom name="floor" type="plane" size="0 0 .05"/></worldbody>
    </mujoco>"""
    with _tf.TemporaryDirectory() as d:
        open(os.path.join(d, "go1.xml"), "w").write(go1_src)
        p = os.path.join(d, "scene.xml")
        open(p, "w").write(textwrap.dedent(scene))
        os.symlink(os.path.join(REF_GO1, "assets"),
                   os.path.join(d, "assets"))
        mm = mujoco.MjModel.from_xml_path(p)
    dd = mujoco.MjData(mm)
    mujoco.mj_resetDataKeyframe(mm, dd, 0)
    dd.ctrl[:] = mm.key_ctrl[0]
    for _ in range(200):
        mujoco.mj_step(mm, dd)
    qm = []
    n_per = int(round(0.02 / mm.opt.timestep))
    for k in range(T):
        dd.ctrl[:] = ctrls[k]
        for _ in range(n_per):
            mujoco.mj_step(mm, dd)
        qm.append(dd.qpos.copy())
    q_mj = np.asarray(qm)

    dist = abs(q_mj[-1, 0])
    assert dist > 2.0, f"oracle barely moved ({dist:.3f} m)"
    x_rmse = _rmse(q_ours[:, 0], q_mj[:, 0])
    assert x_rmse / dist < 0.05, \
        f"trunk-x RMSE {x_rmse:.3f} m = {100 * x_rmse / dist:.1f}% of {dist:.2f} m"
    assert _rmse(q_ours[:, 2], q_mj[:, 2]) < 0.016
    assert _rmse(q_ours[:, 7:], q_mj[:, 7:]) < 0.015
    # same direction, comparable displacement
    assert abs(q_ours[-1, 0] - q_mj[-1, 0]) / dist < 0.10

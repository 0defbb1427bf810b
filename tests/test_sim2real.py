import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.assets import load_opendog
from opendog_tpu.envs import SymWalkEnv
from opendog_tpu.sim2real.calibration import (
    ACTUATOR_NAMES_ORDERED,
    Calibration,
    REAL_HOME_DEG,
)
from opendog_tpu.sim2real import gait_json


def test_calibration_roundtrip():
    m = load_opendog("flat")
    cal = Calibration(m)
    # sim home maps exactly to the real home pose (train.py:120-130)
    real = np.asarray(cal.sim_rad_to_real_deg(jnp.asarray(cal.sim_home_rad)))
    want = [REAL_HOME_DEG[n] for n in ACTUATOR_NAMES_ORDERED]
    np.testing.assert_allclose(real, want, atol=1e-4)
    # roundtrip through both maps
    sim = np.asarray(
        cal.real_deg_to_sim_rad(jnp.asarray(real, jnp.float32), clip=False)
    )
    np.testing.assert_allclose(sim, cal.sim_home_rad, atol=1e-5)
    # +10 deg on FR thigh = +10*pi/180 rad in sim (scale 1.0)
    real10 = np.array(real)
    real10[0] += 10.0
    sim10 = np.asarray(
        cal.real_deg_to_sim_rad(jnp.asarray(real10, jnp.float32), clip=False)
    )
    assert abs((sim10[0] - sim[0]) - np.deg2rad(10)) < 1e-5


def test_reference_walk_json_roundtrips(tmp_path):
    """Our loader must parse the reference's deployed walk.json artifact and
    our saver must reproduce the schema (sim2real/walk.json)."""
    ref = "/root/reference/Code/mujoco/sim2real/walk.json"
    if os.path.exists(ref):
        durations, targets = gait_json.load_gait(ref)
        assert targets.shape[1] == 8
        assert durations[0] == 0.1  # 0.1 s steps (the deployed gait)
        assert len(durations) == 32
    # save/load roundtrip
    p = str(tmp_path / "g.json")
    t = np.random.default_rng(0).uniform(-45, 45, (5, 8))
    gait_json.save_gait(p, [0.1] * 5, t)
    d2, t2 = gait_json.load_gait(p)
    np.testing.assert_allclose(t2, np.round(t, 2))
    # schema check
    seq = json.load(open(p))
    assert set(seq[0].keys()) == {"duration", "targets_deg"}
    assert set(seq[0]["targets_deg"].keys()) == set(ACTUATOR_NAMES_ORDERED)


def test_generate_walk_json_from_policy(tmp_path):
    m = load_opendog("flat")
    env = SymWalkEnv(m)
    p = str(tmp_path / "walk_rl.json")
    n = gait_json.generate_walk_json(
        lambda obs: jnp.zeros(4), env, p, num_steps=5
    )
    assert n >= 1
    d, t = gait_json.load_gait(p)
    assert t.shape == (n, 8)
    # a zero-action policy holds the home pose in real degrees
    want = [REAL_HOME_DEG[nm] for nm in ACTUATOR_NAMES_ORDERED]
    np.testing.assert_allclose(t[0], want, atol=1.0)


def test_gait_to_sim_ctrl_clamps():
    m = load_opendog("flat")
    t = np.full((3, 8), 500.0)  # absurd degrees
    ctrl = gait_json.gait_to_sim_ctrl(m, [0.1] * 3, t)
    cr = np.asarray(m.actuator_ctrlrange)
    assert np.all(ctrl >= cr[:, 0] - 1e-6) and np.all(ctrl <= cr[:, 1] + 1e-6)


def test_actuator_perturbation_table_invariants():
    """Port of the reference's pre-training self-test
    (run_actuator_perturbation_test, sim2real/train.py:439-496), made
    automatic: the symmetric expansion must mirror FR-thigh deltas onto
    BL, FL onto BR, and knee-pair deltas must be antisymmetric and
    phase-gated."""
    from opendog_tpu.assets import load_opendog
    from opendog_tpu.envs import SymWalkEnv
    from opendog_tpu.sim2real.perturbation import (
        actuator_perturbation_table,
    )

    env = SymWalkEnv(load_opendog("flat"))
    rows = actuator_perturbation_table(env, delta_deg=15.0)
    assert len(rows) == 4 * 2 * 2 * 8

    def delta(rows, actuator):
        m = [r for r in rows if r["actuator"] == actuator]
        assert len(m) == 1
        return m[0]["applied_sim_delta_rad"]

    # FR-thigh channel, +15 deg, phase 0: FR and BL thighs move together,
    # FL/BR untouched, all knees untouched
    sel = [r for r in rows if r["channel"] == "FR_tigh_delta"
           and r["sign"] == 1 and r["phase"] == 0]
    d_fr = delta(sel, "FR_tigh_actuator")
    d_bl = delta(sel, "BL_tigh_actuator")
    assert abs(d_fr - d_bl) < 1e-6 and abs(d_fr) > 0.1
    assert abs(delta(sel, "FL_tigh_actuator")) < 1e-6
    for knee in ("FR_knee_actuator", "FL_knee_actuator",
                 "BL_knee_actuator", "BR_knee_actuator"):
        assert abs(delta(sel, knee)) < 1e-6

    # Knee pair 1, phase 0: FR knee and BL knee antisymmetric; in phase 1
    # the same channel is inert (train.py:243-259)
    sel0 = [r for r in rows if r["channel"] == "Knee_P1(FR/BL)_sw_delta"
            and r["sign"] == 1 and r["phase"] == 0]
    d_frk = delta(sel0, "FR_knee_actuator")
    d_blk = delta(sel0, "BL_knee_actuator")
    # antisymmetric up to ctrlrange clipping (the knee range is only
    # 0.6 rad wide, so one side may saturate — the reference clamps the
    # same way, train.py:265-269)
    assert d_frk > 0.1 and d_blk < -0.1
    assert abs(d_frk + d_blk) < 0.06
    sel1 = [r for r in rows if r["channel"] == "Knee_P1(FR/BL)_sw_delta"
            and r["sign"] == 1 and r["phase"] == 1]
    assert abs(delta(sel1, "FR_knee_actuator")) < 1e-6
    assert abs(delta(sel1, "BL_knee_actuator")) < 1e-6

    # real-degree deltas are finite and bounded by calibration scaling
    assert all(np.isfinite(r["real_delta_deg"]) for r in rows)
    assert all(abs(r["real_delta_deg"]) < 90 for r in rows)

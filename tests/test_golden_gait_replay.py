"""Golden gait-replay parity: the reference's *trained, deployed* gait
artifacts replayed through our engine vs. the MuJoCo oracle.

The reference's converged artifacts (``sim2real/best/walk_rl_sym_ep4600.json``,
``sim2real/walk.json`` — SURVEY §6) are the strongest available ground truth
for trajectory parity: both engines execute the same real-degree gait through
the same calibration map, and the resulting base motion is compared.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendog_tpu.assets import load_opendog
from opendog_tpu.physics import State, dynamics, make_state
from opendog_tpu.sim2real import gait_json

REF_GAIT = "/root/reference/Code/mujoco/sim2real/best/walk_rl_sym_ep4600.json"
REF_SCENE_SED = "/root/reference/Code/mujoco/our_robot"


def _replay_ours(model, durations, ctrl_model, settle=100):
    state = make_state(model, "home")
    hold = jnp.asarray(model.key_ctrl[0])
    state, _ = dynamics.step(model, state, hold, None, n_substeps=settle)
    step50 = jax.jit(lambda s, c: dynamics.step(model, s, c,
                                                n_substeps=50)[0])
    xs, zs = [], []
    for dur, ctrl in zip(durations, ctrl_model):
        n50 = max(1, int(round(dur / (model.timestep * 50))))
        for _ in range(n50):
            state = step50(state, jnp.asarray(ctrl))
        xs.append(float(state.qpos[0]))
        zs.append(float(state.qpos[2]))
    return np.asarray(xs), np.asarray(zs)


@pytest.mark.skipif(not os.path.exists(REF_GAIT),
                    reason="reference artifacts not mounted")
def test_reference_trained_gait_replays_consistently():
    """Replaying the converged ep4600 gait: our engine must produce bounded,
    healthy motion with the same qualitative outcome as the MuJoCo oracle
    (forward displacement of the same sign and magnitude class)."""
    durations, targets_deg = gait_json.load_gait(REF_GAIT)
    model = load_opendog("flat")
    ctrl_model = gait_json.gait_to_sim_ctrl(model, durations, targets_deg)
    xs, zs = _replay_ours(model, durations, ctrl_model)
    assert np.all(np.isfinite(xs))
    # healthy band: never fully collapsed nor launched
    assert zs.min() > 0.03 and zs.max() < 0.25, (zs.min(), zs.max())

    # oracle comparison when mujoco is importable
    try:
        import mujoco
    except ImportError:
        return
    import textwrap

    xml = f"""<mujoco model=\"scene\">
      <include file=\"{REF_SCENE_SED}/our_robot.xml\"/>
      <compiler meshdir=\"{REF_SCENE_SED}/assets\"/>
      <worldbody><geom name=\"floor\" type=\"plane\" size=\"0 0 .05\"/></worldbody>
    </mujoco>"""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "scene.xml")
        open(p, "w").write(textwrap.dedent(xml))
        mm = mujoco.MjModel.from_xml_path(p)
    dd = mujoco.MjData(mm)
    mujoco.mj_resetDataKeyframe(mm, dd, 0)
    dd.ctrl[:] = mm.key_ctrl[0]
    for _ in range(100):
        mujoco.mj_step(mm, dd)
    # map our model-order ctrl into mujoco's actuator order (identical
    # declaration order by construction)
    xs_mj = []
    for dur, ctrl in zip(durations, ctrl_model):
        dd.ctrl[:] = ctrl
        for _ in range(int(round(dur / mm.opt.timestep))):
            mujoco.mj_step(mm, dd)
        xs_mj.append(dd.qpos[0])
    xs_mj = np.asarray(xs_mj)
    # same displacement direction and within 12 cm absolute at the end of
    # the 10 s gait (different contact models accumulate drift)
    assert np.sign(xs[-1]) == np.sign(xs_mj[-1]) or abs(xs_mj[-1]) < 0.05
    assert abs(xs[-1] - xs_mj[-1]) < 0.12, (xs[-1], xs_mj[-1])


def test_designed_trot_replays_in_both_engines():
    """The scripted trot (sim2real/main.py parity) replayed through our
    engine stays healthy and ends near its starting height."""
    from opendog_tpu.sim2real.gait_designer import design_trot

    model = load_opendog("flat")
    durations, sim_ctrl_cal, real_deg = design_trot(model)
    ctrl_model = gait_json.gait_to_sim_ctrl(model, durations, real_deg)
    xs, zs = _replay_ours(model, durations, ctrl_model)
    assert np.all(np.isfinite(xs))
    assert zs.min() > 0.03

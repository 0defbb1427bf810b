import os
import shutil

import numpy as np
import pytest

from opendog_tpu.assets import load_go1, load_opendog

REFERENCE = "/root/reference/Code/mujoco"


def test_opendog_sizes_and_addressing():
    """Parity with the compiled reference model (our_robot.xml via MuJoCo:
    nq=15, nv=14, nu=8, 13 movable bodies)."""
    m = load_opendog("flat")
    assert (m.nq, m.nv, m.nu, m.nbody) == (15, 14, 8, 13)
    # actuator declaration order (our_robot.xml:99-111)
    assert m.actuator_names == (
        "FR_tigh_actuator", "FR_knee_actuator",
        "BR_tigh_actuator", "BR_knee_actuator",
        "FL_tigh_actuator", "FL_knee_actuator",
        "BL_tigh_actuator", "BL_knee_actuator",
    )
    # dof addressing matches MuJoCo's compilation of the reference
    assert list(np.asarray(m.actuator_dof)) == [8, 9, 12, 13, 6, 7, 10, 11]
    assert list(np.asarray(m.actuator_qposadr)) == [9, 10, 13, 14, 7, 8, 11, 12]
    # paw bodies are MuJoCo ids [4,7,10,13] minus the world body
    assert m.foot_body == (3, 6, 9, 12)
    np.testing.assert_allclose(np.asarray(m.dof_armature), 0.02)
    np.testing.assert_allclose(np.asarray(m.dof_frictionloss), 0.1)


def test_opendog_home_keyframe():
    m = load_opendog("flat")
    qpos = np.asarray(m.key_qpos[m.key_id("home")])
    want = [0, 0, 0.2, 1, 0, 0, 0] + [2.35619, -1.5708] * 4
    np.testing.assert_allclose(qpos, want, atol=1e-6)
    ctrl = np.asarray(m.key_ctrl[0])
    np.testing.assert_allclose(ctrl, [2.35619, -1.5708] * 4, atol=1e-6)


def test_opendog_mass_matches_reference():
    m = load_opendog("flat")
    total = float(np.sum(np.asarray(m.body_mass)))
    # 1.858 + 4 * (0.01377 + 0.01036 + 0.001)
    assert abs(total - 1.95852) < 1e-5


def test_go1_sizes():
    m = load_go1("flat")
    assert (m.nq, m.nv, m.nu, m.nbody) == (19, 18, 12, 13)
    assert m.key_names == ("home", "descent")
    assert abs(float(m.key_qpos[1][2]) - 0.6) < 1e-6  # descent (go1.xml:227)
    # joint damping layout: hips 1, thighs/calves 2 (go1.xml:9-22)
    d = np.asarray(m.dof_damping)
    np.testing.assert_allclose(d[:6], 0.0)
    np.testing.assert_allclose(d[6:], [1, 2, 2] * 4)
    # foot sites present
    for s in ("FR", "FL", "RR", "RL"):
        assert s in m.site_names


def test_go1_scene_boxes():
    j = load_go1("jump")
    np.testing.assert_allclose(np.asarray(j.wbox_pos), [[1.0, 0, 0.09]])
    lnd = load_go1("landing")
    np.testing.assert_allclose(np.asarray(lnd.wbox_size), [[0.4, 0.4, 0.2]])


def test_robotold_ingestion(tmp_path):
    """The legacy sim2real/robotold.xml loads through the MJCF pipeline
    (VERDICT r3 'cheapest remaining row').  The file's meshdir points at a
    sim2real/assets dir absent from the snapshot; its meshes live under
    our_robot/assets, so the test stages them there."""
    src = os.path.join(REFERENCE, "sim2real", "robotold.xml")
    mesh_src = os.path.join(REFERENCE, "our_robot", "assets")
    if not os.path.exists(src):
        pytest.skip("reference snapshot not mounted")
    from opendog_tpu.physics.mjcf import load_model

    shutil.copy(src, tmp_path / "robotold.xml")
    os.symlink(mesh_src, tmp_path / "assets")
    m = load_model(str(tmp_path / "robotold.xml"))
    # same topology as our_robot.xml: free trunk + 4 x (thigh, knee)
    assert (m.nq, m.nv, m.nu) == (15, 14, 8)
    # trunk 1.157 + 4 legs x (0.01377 + 0.01036 + 0.100 paw)
    total = float(np.sum(np.asarray(m.body_mass)))
    assert abs(total - (1.157 + 4 * 0.12413)) < 1e-5
    # home keyframe (robotold.xml:109-113); its all-zero quaternion is
    # normalised to identity at load (MuJoCo does the same)
    qpos = np.asarray(m.key_qpos[m.key_id("home")])
    np.testing.assert_allclose(
        qpos[:7], [0, 0, 1.0, 1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(
        qpos[7:], [2.94, -2.2, 2.62, -1.81, 2.92, -2.2, 2.62, -1.88],
        atol=1e-6)


def test_terrain_scene_hfield():
    m = load_opendog("terrain")
    assert (m.hfield_nrow, m.hfield_ncol) == (100, 100)
    np.testing.assert_allclose(np.asarray(m.hfield_size), [5.0, 5.0, 0.3, 0.001])


def test_geom_solimp_parsed_and_applied():
    """solimp="dmin dmax width" parses into the progressive-impedance
    model fields (power-1 MuJoCo semantics, go1.xml:62 foot pads) and
    measurably softens contact; models without solimp keep None fields
    (crisp penalty, byte-identical behavior)."""
    import jax
    import jax.numpy as jnp

    from opendog_tpu.physics import dynamics, make_state
    from opendog_tpu.physics.mjcf import load_model

    xml = """<mujoco model="t">
      <option timestep="0.002"/>
      <worldbody>
        <geom name="floor" type="plane" size="0 0 .05"/>
        <body name="b" pos="0 0 0.3">
          <freejoint/>
          <inertial pos="0 0 0" mass="1.0" diaginertia="0.01 0.01 0.01"/>
          <geom name="ball" type="sphere" size="0.05" mass="0"
                solref="-2000 -50" solimp="0.02 1 0.01"/>
        </body>
      </worldbody>
      <keyframe><key name="home" qpos="0 0 0.3 1 0 0 0"/></keyframe>
    </mujoco>"""
    m = load_model(xml)
    assert np.allclose(np.asarray(m.geom_imp_dmin), [0.02])
    assert np.allclose(np.asarray(m.geom_imp_width), [0.01])
    m0 = load_model(xml.replace(' solimp="0.02 1 0.01"', ""))
    assert m0.geom_imp_dmin is None and m0.geom_imp_width is None

    def settle(model):
        s = make_state(model, "home")
        s2, _ = jax.jit(lambda st: dynamics.step(
            model, st, jnp.zeros((0,)), None, n_substeps=400))(s)
        return float(s2.qpos[2])

    z_soft, z_crisp = settle(m), settle(m0)
    assert np.isfinite(z_soft) and np.isfinite(z_crisp)
    assert z_soft < z_crisp - 1e-4, (z_soft, z_crisp)

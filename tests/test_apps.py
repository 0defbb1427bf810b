import numpy as np

from opendog_tpu.apps import (
    action_to_target_degrees,
    autocorrect_trot_cycle,
    build_observation,
    stabilization_targets,
    stance_vector,
    VelocityEstimator,
)
from opendog_tpu.sim2real.calibration import ACTUATOR_NAMES_ORDERED


def _idx(name):
    return list(ACTUATOR_NAMES_ORDERED).index(name)


def test_stance_vector_matches_reference_pose():
    """udp_walk_straight.py:130-141 canonical stance."""
    s = stance_vector()
    assert s[_idx("FR_tigh_actuator")] == -45.0
    assert s[_idx("FR_knee_actuator")] == 45.0
    assert s[_idx("BL_knee_actuator")] == -45.0


def test_autocorrect_trot_neutral():
    """Zero yaw error -> symmetric 30 deg lifts (udp_walk_straight.py:187)."""
    steps = autocorrect_trot_cycle(0.0)
    assert len(steps) == 4
    assert steps[0][_idx("FR_knee_actuator")] == 30.0
    assert steps[0][_idx("BL_knee_actuator")] == -30.0
    assert steps[2][_idx("FL_knee_actuator")] == 30.0
    assert steps[2][_idx("BR_knee_actuator")] == -30.0
    # plant steps return to stance
    assert steps[1] == stance_vector()


def test_autocorrect_trot_steers():
    """Positive yaw error reduces N and raises Y, clamped to [20, 50]
    (udp_walk_straight.py:182-188)."""
    steps = autocorrect_trot_cycle(10.0)  # correction = 15
    n = steps[0][_idx("FR_knee_actuator")]
    y = steps[2][_idx("FL_knee_actuator")]
    assert n == 20.0  # 30 - 15 clamped to 20
    assert y == 45.0  # 30 + 15
    steps = autocorrect_trot_cycle(100.0)
    assert steps[0][_idx("FR_knee_actuator")] == 20.0
    assert steps[2][_idx("FL_knee_actuator")] == 50.0


def test_stabilization_targets_shift_sides():
    """Roll shifts right-side joints one way, left the other
    (stabilization.py:222-239), with KP=-2."""
    flat = stabilization_targets(0.0)
    assert flat == stance_vector()
    t = stabilization_targets(5.0)  # adj = -10
    assert t[_idx("FR_tigh_actuator")] == -55.0  # -45 + adj
    assert t[_idx("FL_tigh_actuator")] == 55.0   # 45 - adj
    # clamps hold for extreme roll
    t = stabilization_targets(50.0)
    s = stance_vector()
    for i, n in enumerate(ACTUATOR_NAMES_ORDERED):
        if "tigh" in n:
            assert abs(t[i] - s[i]) <= 30.0 + 1e-9


def test_velocity_estimator_damps():
    v = VelocityEstimator()
    v.update(0.0, now=0.0)
    x1 = v.update(1.0, now=0.1)  # +0.1 m/s
    assert abs(x1 - 0.1) < 1e-6
    x2 = v.update(0.0, now=0.2)
    assert abs(x2 - 0.099) < 1e-6  # damped by 0.99


def test_observation_and_action_maps():
    obs = build_observation([10.0, 0.0, -5.0], [0.0] * 8, 0.5)
    assert obs.shape == (12,)
    assert abs(obs[0] - np.radians(10)) < 1e-6
    # zero action holds the real home pose
    tgt = action_to_target_degrees(np.zeros(8))
    np.testing.assert_allclose(tgt, stance_vector())
    # saturated action clips at +-45 around home
    tgt = action_to_target_degrees(np.ones(8) * 5.0)
    np.testing.assert_allclose(tgt - np.asarray(stance_vector()), 45.0)

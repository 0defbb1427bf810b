import numpy as np
import jax.numpy as jnp

from opendog_tpu.apps.mapping import DeadReckoner, VoxelMap, transform_points
from opendog_tpu.sim2real.gait_json import transform_gait
from opendog_tpu.sim2real.calibration import ACTUATOR_NAMES_ORDERED


def test_transform_points_rotation():
    pts = jnp.array([[1.0, 0.0, 0.1]])
    out = np.asarray(transform_points(pts, (0.0, 0.0, np.pi / 2)))
    np.testing.assert_allclose(out[0], [0.0, 1.0, 0.1], atol=1e-6)


def test_voxel_map_accumulates_and_thresholds():
    vm = VoxelMap(extent=2.0, voxel=0.5)
    cloud = jnp.tile(jnp.array([[1.1, -0.6, 0.3]]), (10, 1))
    vm = vm.integrate(cloud)
    occ = vm.occupied(threshold=3)
    assert len(occ) == 1
    assert abs(occ[0][0] - 1.25) < 0.26 and abs(occ[0][1] + 0.75) < 0.26
    # below-ground points are filtered
    vm2 = VoxelMap(extent=2.0, voxel=0.5).integrate(
        jnp.tile(jnp.array([[1.1, -0.6, -0.5]]), (10, 1))
    )
    assert len(vm2.occupied(threshold=3)) == 0


def test_dead_reckoner():
    dr = DeadReckoner()
    dr.update(1.0, 0.0, 0.0, dt=0.5)
    assert abs(dr.x - 0.5) < 1e-9
    dr.update(1.0, 0.0, 90.0, dt=0.5)  # heading now +90 deg
    assert abs(dr.y - 0.5) < 1e-6


def test_transform_gait_invert_channels():
    """invert.py:5-18 parity: flip FL/FR thigh signs."""
    t = np.ones((3, 8)) * 10.0
    out = transform_gait(t, invert=("FL_tigh_actuator", "FR_tigh_actuator"))
    i_fl = ACTUATOR_NAMES_ORDERED.index("FL_tigh_actuator")
    i_fr = ACTUATOR_NAMES_ORDERED.index("FR_tigh_actuator")
    assert out[0, i_fl] == -10.0 and out[0, i_fr] == -10.0
    assert out[0, 1] == 10.0
    # sign/offset path
    out2 = transform_gait(t, sign=np.full(8, -1.0), offset_deg=np.full(8, 5.0))
    np.testing.assert_allclose(out2, -5.0)

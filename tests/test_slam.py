"""Terrain-relative localization (VERDICT r2 item 8).

The reference's SLAM layer is RTAB-Map pose-graph localization over L515
depth (``Code/SLAM.md:1-123``, ``examples/slam_realtime.py``).  These tests
pin the TPU-native equivalent: synthetic depth rendered from the sim +
point-to-plane ICP correcting the dead reckoner, demonstrably beating
open-loop dead reckoning on a simulated walk.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opendog_tpu.apps.slam import (
    CamConfig,
    TerrainLocalizer,
    point_to_plane_icp,
    render_depth,
    simulate_walk_localization,
)
from opendog_tpu.assets import load_opendog
from opendog_tpu.physics.model import Terrain
from opendog_tpu.physics.terrain import generate_terrain


@pytest.fixture(scope="module")
def rough_world():
    m = load_opendog("terrain")
    # PRNGKey(0) draws a non-flat episode (relief ~0.3 m); guard it so a
    # terrain-generator change can't silently flatten the fixture
    terr = generate_terrain(jax.random.PRNGKey(0), m)
    assert float(terr.height.max() - terr.height.min()) > 0.05
    return m, terr


def test_render_depth_hits_terrain(rough_world):
    m, terr = rough_world
    pts = np.asarray(render_depth(m, terr, jnp.array([0.2, 0.1, 0.3])))
    hits = np.isfinite(pts).all(axis=1)
    assert hits.mean() > 0.8  # downward camera sees ground nearly everywhere
    # hit points lie on the terrain: residual to the heightfield is tiny
    from opendog_tpu.physics.dynamics import _terrain_height_normal

    p = pts[hits]
    # robot frame at yaw=0.3, (0.2, 0.1): transform back to world
    c, s = np.cos(0.3), np.sin(0.3)
    pw = np.stack([c * p[:, 0] - s * p[:, 1] + 0.2,
                   s * p[:, 0] + c * p[:, 1] + 0.1, p[:, 2]], axis=1)
    h, _ = _terrain_height_normal(m, terr, jnp.asarray(pw[:, :2]))
    assert float(np.abs(pw[:, 2] - np.asarray(h)).max()) < 5e-3


def test_icp_recovers_pose_offset(rough_world):
    """A 12 cm / 3.4 deg initial error must collapse to millimeters."""
    m, terr = rough_world
    pose_gt = jnp.array([0.3, -0.2, 0.2])
    pts = render_depth(m, terr, pose_gt)
    pose0 = pose_gt + jnp.array([0.12, -0.08, 0.06])
    rec, rms = point_to_plane_icp(m, terr, pts, pose0)
    err = np.abs(np.asarray(rec) - np.asarray(pose_gt))
    assert err[0] < 5e-3 and err[1] < 5e-3, err
    assert err[2] < 2e-2, err
    assert float(rms) < 1e-2


def test_icp_flat_terrain_degrades_to_odometry():
    """Featureless ground gives no (x, y) information: damped Gauss-Newton
    must stay at the initial pose (not blow up) — you cannot localize on a
    billiard table."""
    m = load_opendog("terrain")
    terr = Terrain(height=jnp.full((10, 10), 0.151))
    pose_gt = jnp.array([0.0, 0.0, 0.0])
    pts = render_depth(m, terr, pose_gt)
    pose0 = jnp.array([0.1, -0.1, 0.05])
    rec, rms = point_to_plane_icp(m, terr, pts, pose0)
    rec = np.asarray(rec)
    assert np.all(np.isfinite(rec))
    # x/y unobservable -> unchanged (within damping creep)
    assert abs(rec[0] - 0.1) < 2e-2 and abs(rec[1] + 0.1) < 2e-2


def test_localizer_beats_dead_reckoning(rough_world):
    """The headline contract: ICP-corrected trajectory error beats the
    open-loop dead reckoner by a wide margin on a biased-odometry walk."""
    m, terr = rough_world
    met = simulate_walk_localization(m, terr, n_steps=25)
    assert met["icp_beats_deadreckon"]
    assert met["icp_rmse_m"] < 0.5 * met["deadreckon_rmse_m"], met
    assert met["icp_final_err_m"] < 0.05, met


def test_localizer_update_without_frame_is_pure_odometry(rough_world):
    m, terr = rough_world
    loc = TerrainLocalizer(m, terr)
    pose, rms = loc.update(0.2, 0.0, 0.0, 0.1, points_robot=None)
    np.testing.assert_allclose(pose[0], 0.02, atol=1e-6)
    assert np.isnan(rms)


def test_pointcloud_viz_renders_cloud_and_trajectory():
    """Headless point-cloud viewer (the pyray/open3d GUI substitute,
    slam_visualizer.py): orbit frames must place height-colored points
    and the white trajectory polyline with correct occlusion."""
    import numpy as np

    from opendog_tpu.apps.pointcloud_viz import (
        orbit_frames, render_cloud_frame, voxel_downsample,
    )

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-2, 2, 4000), rng.uniform(-2, 2, 4000),
                    0.2 * np.sin(rng.uniform(0, 6, 4000))], 1)
    down = voxel_downsample(pts, voxel_m=0.2)
    assert 10 < down.shape[0] < pts.shape[0]
    traj = np.stack([np.linspace(-1, 1, 30), np.zeros(30)], 1)
    img = render_cloud_frame(down, traj, orbit_deg=40.0)
    assert img.shape == (360, 480, 3) and img.dtype == np.uint8
    lit = (img.astype(int).sum(-1) > 80).sum()
    assert lit > 100, f"only {lit} lit pixels"
    # trajectory drawn in (near-)white
    assert (img.min(-1) > 200).any(), "no white trajectory pixels"
    frames = list(orbit_frames(down, traj, n_frames=3))
    assert len(frames) == 3
    # views from different orbit angles must differ
    assert np.abs(frames[0].astype(int) - frames[1].astype(int)).max() > 0
    # empty cloud degrades gracefully
    empty = render_cloud_frame(np.zeros((0, 3)))
    assert empty.shape == (360, 480, 3)

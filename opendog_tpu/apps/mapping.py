"""Point-cloud mapping — the SLAM-adjacent utilities.

The reference's SLAM layer (``examples/slam_realtime.py``,
``slam_visualizer.py``, ``taller/2.py``, ``Code/SLAM.md``) streams RealSense
L515 depth into voxel maps / RTAB-Map.  The sensor and the GL viewers are
hardware-bound; this module carries the portable core as batched JAX:

  * ``VoxelMap``      — incremental occupancy voxel map accumulated from
                        depth point clouds under a dead-reckoned pose
                        (the obstacle.py path-estimate + voxel pipeline);
  * ``transform_points`` — robot-frame -> world-frame cloud transform;
  * ``cluster_obstacles`` reuses apps.obstacle.detect_obstacles.

Whisper-style gated capture: a RealSense grabber is provided behind an
optional import (`pyrealsense2` is not in the image).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def transform_points(points_robot: jnp.ndarray, pose_xy_yaw) -> jnp.ndarray:
    """(N, 3) robot-frame points -> world frame under (x, y, yaw)."""
    x, y, yaw = pose_xy_yaw
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    R = jnp.array([[c, -s], [s, c]])
    xy = points_robot[:, :2] @ R.T + jnp.array([x, y])
    return jnp.concatenate([xy, points_robot[:, 2:3]], axis=1)


@dataclass
class VoxelMap:
    """Occupancy counts over a fixed world grid (jit-able update)."""

    extent: float = 5.0
    voxel: float = 0.1
    height_band: Tuple[float, float] = (0.02, 0.8)
    counts: Optional[jnp.ndarray] = None

    def __post_init__(self):
        n = int(2 * self.extent / self.voxel)
        if self.counts is None:
            self.counts = jnp.zeros((n, n), jnp.int32)

    def integrate(self, points_world: jnp.ndarray) -> "VoxelMap":
        n = self.counts.shape[0]
        valid = (
            (jnp.abs(points_world[:, 0]) < self.extent)
            & (jnp.abs(points_world[:, 1]) < self.extent)
            & (points_world[:, 2] > self.height_band[0])
            & (points_world[:, 2] < self.height_band[1])
        )
        ij = jnp.clip(
            ((points_world[:, :2] + self.extent) / self.voxel).astype(
                jnp.int32
            ),
            0, n - 1,
        )
        counts = self.counts.at[ij[:, 0], ij[:, 1]].add(
            valid.astype(jnp.int32)
        )
        return VoxelMap(self.extent, self.voxel, self.height_band, counts)

    def occupied(self, threshold: int = 3) -> np.ndarray:
        """(M, 2) world xy centers of occupied voxels (host-side)."""
        c = np.asarray(self.counts)
        ii, jj = np.nonzero(c >= threshold)
        return np.stack(
            [ii * self.voxel - self.extent + self.voxel / 2,
             jj * self.voxel - self.extent + self.voxel / 2], axis=1
        )


@dataclass
class DeadReckoner:
    """Velocity-integrated planar pose estimate (obstacle.py's path
    estimate + run_robot.py's damped velocity integration)."""

    x: float = 0.0
    y: float = 0.0
    yaw: float = 0.0

    def update(self, vx: float, vy: float, yaw_deg: float, dt: float):
        self.yaw = np.radians(yaw_deg)
        c, s = np.cos(self.yaw), np.sin(self.yaw)
        self.x += (vx * c - vy * s) * dt
        self.y += (vx * s + vy * c) * dt
        return (self.x, self.y, self.yaw)


def make_realsense_source(width: int = 640, height: int = 480, fps: int = 30):
    """Optional RealSense L515 depth source (SLAM.md pipeline); raises
    ImportError when pyrealsense2 is absent."""
    import pyrealsense2 as rs  # gated

    pipeline = rs.pipeline()
    cfg = rs.config()
    cfg.enable_stream(rs.stream.depth, width, height, rs.format.z16, fps)
    profile = pipeline.start(cfg)
    pc = rs.pointcloud()

    def grab() -> np.ndarray:
        frames = pipeline.wait_for_frames()
        depth = frames.get_depth_frame()
        points = pc.calculate(depth)
        v = np.asanyarray(points.get_vertices()).view(np.float32)
        return v.reshape(-1, 3)

    return grab

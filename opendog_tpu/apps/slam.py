"""Terrain-relative localization — the SLAM pose-correction layer.

The reference runs RTAB-Map SLAM over a RealSense L515 (``Code/SLAM.md:1-123``,
``examples/slam_realtime.py``): pose-graph localization correcting wheel-less
dead reckoning.  ``apps/mapping.py`` carried the mapping half (voxel map +
dead reckoner) but localization stayed open-loop (round-2 VERDICT item 8).
This module closes it, TPU-style:

  * ``render_depth``       — synthetic depth from the sim: camera rays
                             ray-marched against the bilinear heightfield
                             (fixed-step coarse search + bisection, all
                             ``lax``-control-flow, vmapped over pixels);
  * ``point_to_plane_icp`` — scan-to-map point-to-plane ICP over the planar
                             pose (x, y, yaw): Gauss-Newton with projective
                             association onto the heightfield surface,
                             Jacobians via ``jax.jacfwd``, fixed-iteration
                             ``lax.scan`` (jit-able, batchable);
  * ``TerrainLocalizer``   — dead-reckoner prediction + ICP correction;
  * ``simulate_walk_localization`` — the evidence harness: a simulated walk
                             with biased odometry, reporting trajectory RMSE
                             for dead reckoning vs ICP-corrected.

On featureless (flat) terrain the ICP normal equations are singular in
(x, y); Levenberg damping then leaves the pose at the odometry prediction —
the correct degenerate behavior (you cannot localize on a billiard table).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..physics.dynamics import _terrain_height_normal
from ..physics.model import Terrain
from .mapping import DeadReckoner


class CamConfig(NamedTuple):
    """Depth camera intrinsics/mount (L515-ish field of view, decimated)."""

    width: int = 32
    height: int = 24
    fov_x_deg: float = 70.0
    cam_height: float = 0.25      # mount height above the trunk origin
    pitch_deg: float = 35.0       # downward pitch
    max_range: float = 4.0


def _ray_grid(cam: CamConfig) -> np.ndarray:
    """(H*W, 3) unit ray directions in the camera frame (x fwd, z up)."""
    fx = 0.5 * cam.width / np.tan(np.radians(cam.fov_x_deg) / 2)
    u = np.arange(cam.width) - (cam.width - 1) / 2
    v = np.arange(cam.height) - (cam.height - 1) / 2
    uu, vv = np.meshgrid(u, v)
    d = np.stack([np.full_like(uu, fx), -uu, -vv], axis=-1).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    p = np.radians(cam.pitch_deg)
    # pitch DOWN about +y: x-forward rays acquire a negative z component
    Rp = np.array([[np.cos(p), 0, np.sin(p)],
                   [0, 1, 0],
                   [-np.sin(p), 0, np.cos(p)]])
    return (d @ Rp.T).astype(np.float32)


def render_depth(model, terrain: Terrain, pose_xy_yaw,
                 cam: CamConfig = CamConfig(), coarse: int = 48,
                 bisect: int = 12) -> jax.Array:
    """Ray-march the heightfield from a camera at planar ``pose`` →
    (H*W, 3) hit points in the ROBOT frame (NaN rows = no hit in range).

    Robot frame: world translated by (-x, -y, 0) and rotated by -yaw; z
    stays absolute (a legged robot knows its height from kinematics)."""
    x, y, yaw = pose_xy_yaw
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    dirs_r = jnp.asarray(_ray_grid(cam))
    # robot->world rotation about z
    Rz = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    dirs_w = dirs_r @ Rz.T
    # camera sits cam_height above the LOCAL terrain (the robot stands on it)
    h0, _ = _terrain_height_normal(
        model, terrain, jnp.array([[x, y]], jnp.float32))
    origin = jnp.array([x, y, h0[0] + cam.cam_height])

    ts = jnp.linspace(0.05, cam.max_range, coarse)

    def sdf(t, d):
        p = origin + t * d
        h, _ = _terrain_height_normal(model, terrain, p[None, :2])
        return p[2] - h[0]

    def march(d):
        phis = jax.vmap(lambda t: sdf(t, d))(ts)
        # first coarse interval with a sign change (above -> below)
        hit = (phis[:-1] > 0) & (phis[1:] <= 0)
        idx = jnp.argmax(hit)
        found = jnp.any(hit)
        lo, hi = ts[idx], ts[idx + 1]

        def bis(carry, _):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            above = sdf(mid, d) > 0
            return (jnp.where(above, mid, lo), jnp.where(above, hi, mid)), None

        (lo, hi), _ = jax.lax.scan(bis, (lo, hi), None, length=bisect)
        t_hit = 0.5 * (lo + hi)
        p_w = origin + t_hit * d
        p_w = jnp.where(found, p_w, jnp.nan)
        # world -> robot frame
        rel = p_w - jnp.array([x, y, 0.0])
        return jnp.array([c * rel[0] + s * rel[1],
                          -s * rel[0] + c * rel[1],
                          rel[2]])

    return jax.vmap(march)(dirs_w)


def point_to_plane_icp(model, terrain: Terrain, points_robot: jax.Array,
                       pose_init, iters: int = 10,
                       damping: float = 1e-3,
                       huber_delta: float = 0.08):
    """Scan-to-map point-to-plane ICP over the planar pose.

    Residual per point: ``n(q)·(T_pose(p) - q)`` with ``q`` the vertical
    projection of the transformed point onto the heightfield and ``n`` its
    surface normal (projective data association, recomputed every
    Gauss-Newton iteration).  Huber weights bound outlier influence; the
    3x3 normal equations get Levenberg damping so featureless terrain
    degrades to the initial pose instead of exploding.  Fully jittable.
    """
    pts = points_robot
    finite = jnp.isfinite(pts).all(axis=1)
    pts = jnp.where(finite[:, None], pts, 0.0)

    def residuals(pose):
        x, y, yaw = pose[0], pose[1], pose[2]
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        px = c * pts[:, 0] - s * pts[:, 1] + x
        py = s * pts[:, 0] + c * pts[:, 1] + y
        pz = pts[:, 2]
        h, n = _terrain_height_normal(
            model, terrain, jnp.stack([px, py], axis=-1))
        return n[:, 2] * (pz - h)

    def gn_step(pose, _):
        r = residuals(pose)
        J = jax.jacfwd(residuals)(pose)          # (N, 3)
        w = finite / jnp.maximum(1.0, jnp.abs(r) / huber_delta)
        JtJ = (J * w[:, None]).T @ J + damping * jnp.eye(3)
        Jtr = (J * w[:, None]).T @ r
        delta = jnp.linalg.solve(JtJ, Jtr)
        return pose - delta, jnp.sqrt(jnp.mean(w * r ** 2))

    pose0 = jnp.asarray(pose_init, jnp.float32)
    pose, rms = jax.lax.scan(gn_step, pose0, None, length=iters)
    return pose, rms[-1]


class TerrainLocalizer:
    """Dead-reckoner prediction + ICP correction (the RTAB-Map role)."""

    def __init__(self, model, terrain: Terrain, cam: CamConfig = CamConfig(),
                 iters: int = 10):
        self.model = model
        self.terrain = terrain
        self.cam = cam
        self.reckoner = DeadReckoner()
        self._icp = jax.jit(
            lambda pts, pose: point_to_plane_icp(
                model, terrain, pts, pose, iters=iters)
        )
        self.pose = np.zeros(3, np.float32)

    def update(self, vx: float, vy: float, yaw_deg: float, dt: float,
               points_robot: Optional[jax.Array] = None
               ) -> Tuple[np.ndarray, float]:
        """Odometry prediction, then (when a depth frame is given) ICP
        correction.  Returns (pose (x, y, yaw), icp_rms)."""
        # predict: integrate odometry velocities from the CURRENT estimate
        # (DeadReckoner semantics, obstacle.py path estimate)
        self.reckoner.x, self.reckoner.y = float(self.pose[0]), float(
            self.pose[1])
        pred = np.asarray(
            self.reckoner.update(vx, vy, yaw_deg, dt), np.float32)
        rms = float("nan")
        if points_robot is not None:
            corrected, rms_arr = self._icp(points_robot, jnp.asarray(pred))
            pred = np.asarray(corrected)
            rms = float(rms_arr)
        self.pose = pred
        return self.pose, rms


def simulate_walk_localization(
    model, terrain: Terrain, n_steps: int = 40, dt: float = 0.1,
    v_true: float = 0.25, odom_bias: float = 0.25, yaw_noise_deg: float = 1.5,
    depth_noise_m: float = 0.01, cam: CamConfig = CamConfig(), seed: int = 0,
):
    """The VERDICT item-8 evidence harness: a simulated walk whose
    odometry is biased (scale error) and yaw-noisy; depth frames are
    rendered from the TRUE pose with ``depth_noise_m`` Gaussian sensor
    noise.  Returns trajectory-error metrics for the open-loop dead
    reckoner vs the ICP-corrected localizer."""
    rng = np.random.default_rng(seed)
    render = jax.jit(
        lambda pose: render_depth(model, terrain, pose, cam=cam))
    loc = TerrainLocalizer(model, terrain, cam=cam)
    reck = DeadReckoner()

    gt = np.zeros((n_steps, 3), np.float32)
    est_dr = np.zeros_like(gt)
    est_icp = np.zeros_like(gt)
    for k in range(n_steps):
        t = (k + 1) * dt
        yaw_true = 0.15 * np.sin(0.5 * t)          # gentle S-curve heading
        gt[k] = [gt[k - 1][0] + v_true * dt * np.cos(yaw_true) if k else
                 v_true * dt * np.cos(yaw_true),
                 gt[k - 1][1] + v_true * dt * np.sin(yaw_true) if k else
                 v_true * dt * np.sin(yaw_true),
                 yaw_true]
        v_odom = v_true * (1.0 + odom_bias)        # biased speed estimate
        yaw_odom_deg = np.degrees(yaw_true) + rng.normal(0, yaw_noise_deg)
        est_dr[k] = reck.update(v_odom, 0.0, yaw_odom_deg, dt)
        frame = np.asarray(render(jnp.asarray(gt[k])))
        frame = frame + rng.normal(0, depth_noise_m, frame.shape)
        pose, _ = loc.update(v_odom, 0.0, yaw_odom_deg, dt,
                             points_robot=jnp.asarray(
                                 frame.astype(np.float32)))
        est_icp[k] = pose

    def rmse(est):
        return float(np.sqrt(np.mean(np.sum(
            (est[:, :2] - gt[:, :2]) ** 2, axis=1))))

    return {
        "steps": n_steps,
        "distance_m": round(float(v_true * dt * n_steps), 3),
        "deadreckon_rmse_m": round(rmse(est_dr), 4),
        "icp_rmse_m": round(rmse(est_icp), 4),
        "deadreckon_final_err_m": round(float(np.linalg.norm(
            est_dr[-1, :2] - gt[-1, :2])), 4),
        "icp_final_err_m": round(float(np.linalg.norm(
            est_icp[-1, :2] - gt[-1, :2])), 4),
        "icp_beats_deadreckon": bool(rmse(est_icp) < rmse(est_dr)),
    }

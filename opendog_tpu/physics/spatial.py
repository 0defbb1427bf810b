"""Spatial algebra and rotation utilities (pure JAX, jit/vmap friendly).

Conventions
-----------
* Quaternions are wxyz (MuJoCo order), unit norm, representing rotation of a
  vector from the local frame into the world frame: ``v_world = R(q) @ v_local``.
* Spatial (6D) motion vectors are ``[omega; v_o]`` — angular velocity and the
  linear velocity of the body-fixed point currently coinciding with the
  reference origin.  Spatial force vectors are ``[torque_o; force]`` about the
  same origin.  This "all quantities at a common origin" formulation keeps the
  Featherstone algorithms frame-free and maps onto batched XLA ops cleanly.
* Euler helpers reproduce the exact roll/pitch/yaw formulas the reference uses
  (``/root/reference/Code/mujoco/sim2real/train.py:110-118`` and
  ``rewards/walk_environment_reward_calc.py:372-390``) so that reward and
  termination semantics match the reference bit-for-bit in float64.

All functions operate on the trailing axes and broadcast over leading batch
axes, so they can be freely composed under ``vmap``/``scan``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (wxyz)
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b (both wxyz)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (local -> world)."""
    qv = q[..., 1:]
    qw = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by the inverse of q (world -> local)."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Quaternion -> 3x3 rotation matrix (local -> world)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_exp(w: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Exponential map: rotation vector w (axis*angle) -> quaternion."""
    angle = jnp.linalg.norm(w, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc-safe: sin(half)/angle -> 0.5 as angle -> 0
    k = jnp.where(angle > eps, jnp.sin(half) / jnp.maximum(angle, eps), 0.5)
    return quat_normalize(
        jnp.concatenate([jnp.cos(half), w * k], axis=-1)
    )


def quat_integrate(q: jax.Array, omega_local: jax.Array, dt) -> jax.Array:
    """Integrate orientation with body-frame angular velocity (MuJoCo free-joint
    convention: rotational qvel of a free joint is expressed in the child body
    frame)."""
    return quat_normalize(quat_mul(q, quat_exp(omega_local * dt)))


def quat_to_ypr(quat: jax.Array):
    """(yaw, pitch, roll) — exact formula parity with the reference's
    ``quat_to_ypr`` (sim2real/train.py:110-118)."""
    q0, q1, q2, q3 = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    sinr_cosp = 2 * (q0 * q1 + q2 * q3)
    cosr_cosp = 1 - 2 * (q1 * q1 + q2 * q2)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = jnp.clip(2 * (q0 * q2 - q3 * q1), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    siny_cosp = 2 * (q0 * q3 + q1 * q2)
    cosy_cosp = 1 - 2 * (q2 * q2 + q3 * q3)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return yaw, pitch, roll


def euler_from_quat(quat: jax.Array):
    """(roll, pitch, yaw) — parity with the reference reward library's
    ``euler_from_quaternion`` (rewards/walk_environment_reward_calc.py:372-390)."""
    yaw, pitch, roll = quat_to_ypr(quat)
    return roll, pitch, yaw


# ---------------------------------------------------------------------------
# 3D helpers
# ---------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix: skew(v) @ u == cross(v, u)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Spatial (6D) algebra at a common origin.  Motion = [omega; v_o].
# ---------------------------------------------------------------------------


def spatial_inertia_at_origin(
    mass: jax.Array, com: jax.Array, inertia_com: jax.Array
) -> jax.Array:
    """6x6 spatial inertia about the reference origin.

    ``inertia_com`` is the 3x3 rotational inertia about the body COM expressed
    in world axes; ``com`` is the world-frame COM position relative to the
    reference origin.  I = [[I_c - m cx cx, m cx], [-m cx, m 1]] with
    cx = skew(com) (note cx^T = -cx).
    """
    cx = skew(com)
    m = mass[..., None, None]
    eye = jnp.eye(3, dtype=com.dtype)
    top_left = inertia_com - m * (cx @ cx)
    top_right = m * cx
    bot_left = -m * cx
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial motion cross product  v ×  m  (both [omega; v_o])."""
    w, vo = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vo, mw)], axis=-1
    )


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product  v ×*  f  (f = [torque_o; force])."""
    w, vo = v[..., :3], v[..., 3:]
    tau, frc = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, tau) + jnp.cross(vo, frc), jnp.cross(w, frc)], axis=-1
    )


def point_velocity(spatial_vel: jax.Array, point: jax.Array) -> jax.Array:
    """Linear velocity of the body-fixed point at world position ``point``
    given the body spatial velocity at the origin."""
    w, vo = spatial_vel[..., :3], spatial_vel[..., 3:]
    return vo + jnp.cross(w, point)

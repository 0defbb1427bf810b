import numpy as np
import jax.numpy as jnp
import pytest

from opendog_tpu.physics import spatial

try:
    from scipy.spatial.transform import Rotation as Rot
    HAVE_SCIPY = True
except ImportError:
    HAVE_SCIPY = False


def rand_quat(rng):
    q = rng.standard_normal(4)
    return q / np.linalg.norm(q)


@pytest.mark.skipif(not HAVE_SCIPY, reason="scipy missing")
def test_quat_mul_rotate_matches_scipy():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a, b = rand_quat(rng), rand_quat(rng)
        v = rng.standard_normal(3)
        ra = Rot.from_quat(np.roll(a, -1))  # wxyz -> xyzw
        rb = Rot.from_quat(np.roll(b, -1))
        got = np.asarray(spatial.quat_mul(jnp.array(a), jnp.array(b)))
        want = np.roll((ra * rb).as_quat(), 1)
        assert np.allclose(got, want, atol=1e-5) or np.allclose(got, -want, atol=1e-5)
        got_v = np.asarray(spatial.quat_rotate(jnp.array(a), jnp.array(v)))
        assert np.allclose(got_v, ra.apply(v), atol=1e-5)


def test_quat_to_mat_consistent_with_rotate():
    rng = np.random.default_rng(1)
    q = jnp.array(rand_quat(rng))
    v = jnp.array(rng.standard_normal(3))
    assert np.allclose(
        np.asarray(spatial.quat_to_mat(q) @ v),
        np.asarray(spatial.quat_rotate(q, v)),
        atol=1e-5,
    )


def test_quat_integrate_body_frame_convention():
    """Integrating a body-frame angular velocity must compose on the right —
    the MuJoCo free-joint convention (verified against mj_step)."""
    # start rotated 90 deg about z; spin about body x = world y
    q0 = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    q = q0
    for _ in range(100):
        q = spatial.quat_integrate(q, jnp.array([1.0, 0, 0]), 0.002)
    # golden from MuJoCo (free joint, inertial body, qvel[3:6]=(1,0,0), 0.2 s)
    want = np.array([0.70357419, 0.07059289, 0.07059289, 0.70357419])
    assert np.allclose(np.asarray(q), want, atol=1e-4)


def test_quat_to_ypr_matches_reference_formula():
    """Exact parity with sim2real/train.py:110-118 quat_to_ypr."""
    import math

    def ref_quat_to_ypr(quat):
        q0, q1, q2, q3 = quat
        sinr_cosp = 2 * (q0 * q1 + q2 * q3)
        cosr_cosp = 1 - 2 * (q1 * q1 + q2 * q2)
        roll = math.atan2(sinr_cosp, cosr_cosp)
        sinp = 2 * (q0 * q2 - q3 * q1)
        pitch = math.asin(sinp) if abs(sinp) < 1 else math.copysign(math.pi / 2, sinp)
        yaw = math.atan2(2 * (q0 * q3 + q1 * q2), 1 - 2 * (q2 * q2 + q3 * q3))
        return yaw, pitch, roll

    rng = np.random.default_rng(2)
    for _ in range(10):
        q = rand_quat(rng)
        want = ref_quat_to_ypr(q)
        got = spatial.quat_to_ypr(jnp.array(q))
        assert np.allclose([float(g) for g in got], want, atol=1e-5)


def test_spatial_inertia_momentum():
    """I @ [omega; v] must equal [angular momentum about origin; linear]."""
    m = jnp.array(2.0)
    c = jnp.array([0.3, -0.2, 0.5])
    Ic = jnp.diag(jnp.array([0.1, 0.2, 0.3]))
    I = spatial.spatial_inertia_at_origin(m, c, Ic)
    w = jnp.array([0.5, -1.0, 0.25])
    v0 = jnp.array([1.0, 0.0, -0.5])  # velocity of point at origin
    h = I @ jnp.concatenate([w, v0])
    v_com = v0 + jnp.cross(w, c)
    lin = m * v_com
    ang = Ic @ w + m * jnp.cross(c, v_com)  # about origin
    assert np.allclose(np.asarray(h[3:]), np.asarray(lin), atol=1e-5)
    assert np.allclose(np.asarray(h[:3]), np.asarray(ang), atol=1e-5)


def test_motion_cross_identity():
    v = jnp.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6])
    assert np.allclose(np.asarray(spatial.motion_cross(v, v)), 0.0, atol=1e-7)

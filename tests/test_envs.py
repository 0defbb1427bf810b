import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.assets import load_go1, load_opendog
from opendog_tpu.envs import (
    JumpEnv,
    LandingEnv,
    SymWalkEnv,
    TerrainWalkEnv,
    WalkEnv,
    vector_env,
)
from opendog_tpu.physics import terrain as terrain_lib


def test_walk_env_reset_step_shapes():
    m = load_opendog("flat")
    env = WalkEnv(m)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (33,)  # WalkEnvironment.py obs layout
    action = jnp.zeros(8)
    state, trans = jax.jit(env.step)(state, action)
    assert trans.obs.shape == (33,)
    assert np.isfinite(float(trans.reward))
    assert trans.reward >= 0.0  # reward = max(0, ...) (WalkEnvironment.py:84)


def test_walk_env_survives_home_hold():
    """Holding the home posture (action decoding the home ctrl) must not
    terminate for at least 50 steps (1 s)."""
    m = load_opendog("flat")
    env = WalkEnv(m)
    # action that decodes exactly to home ctrl under the ctrlrange lerp
    lo, hi = env.ctrlrange[:, 0], env.ctrlrange[:, 1]
    a_home = jnp.asarray(2 * (env.home_ctrl - lo) / (hi - lo) - 1)
    state, obs = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for _ in range(50):
        state, trans = step(state, a_home)
        assert not bool(trans.terminated)


def test_vector_env_autoreset():
    m = load_opendog("flat")
    env = WalkEnv(m)
    reset_fn, step_fn = vector_env(env)
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, obs = jax.jit(reset_fn)(keys)
    assert obs.shape == (B, 33)
    # crazy action to hasten termination in some envs
    actions = jnp.ones((B, 8))
    sfn = jax.jit(step_fn)
    for i in range(30):
        keys = jax.random.split(jax.random.PRNGKey(i + 1), B)
        states, trans = sfn(states, actions, keys)
    assert np.all(np.isfinite(np.asarray(trans.obs)))
    # step counters must have reset for terminated envs
    assert np.all(np.asarray(states.step_count) <= 30)


def test_sym_walk_env_phase_expansion():
    """Symmetric expansion parity with sim2real/train.py:243-259: BL thigh
    mirrors FR, BR mirrors FL; knees alternate by phase with sign flip."""
    m = load_opendog("flat")
    env = SymWalkEnv(m)
    a = jnp.array([0.5, 0.3, -0.2, 0.4])
    A = env.action_amplitude
    ctrl0 = np.asarray(env.expand_action(a, jnp.zeros((), jnp.int32)))
    ctrl1 = np.asarray(env.expand_action(a, jnp.ones((), jnp.int32)))
    names = m.actuator_names  # model order
    idx = {n: i for i, n in enumerate(names)}
    home = {n: env.cal.sim_home_rad[list(env.cal.order).index(n)]
            for n in names}

    cr = {n: m.actuator_ctrlrange[i] for i, n in enumerate(names)}

    def expect(n, delta):
        return float(np.clip(home[n] + delta, cr[n][0], cr[n][1]))

    def got(ctrl, n):
        return ctrl[idx[n]]

    # thighs: FR=a0, FL=a2, BL=a0, BR=a2 in both phases (clipped to
    # ctrlrange, matching train.py:276)
    for ctrl in (ctrl0, ctrl1):
        assert abs(got(ctrl, "FR_tigh_actuator") - expect("FR_tigh_actuator", 0.5 * A)) < 1e-5
        assert abs(got(ctrl, "BL_tigh_actuator") - expect("BL_tigh_actuator", 0.5 * A)) < 1e-5
        assert abs(got(ctrl, "FL_tigh_actuator") - expect("FL_tigh_actuator", -0.2 * A)) < 1e-5
        assert abs(got(ctrl, "BR_tigh_actuator") - expect("BR_tigh_actuator", -0.2 * A)) < 1e-5
    # phase 0: FR knee +a1, BL knee -a1, others 0
    assert abs(got(ctrl0, "FR_knee_actuator") - expect("FR_knee_actuator", 0.3 * A)) < 1e-5
    assert abs(got(ctrl0, "BL_knee_actuator") - expect("BL_knee_actuator", -0.3 * A)) < 1e-5
    assert abs(got(ctrl0, "FL_knee_actuator") - expect("FL_knee_actuator", 0.0)) < 1e-5
    # phase 1: FL knee +a3, BR knee -a3
    assert abs(got(ctrl1, "FL_knee_actuator") - expect("FL_knee_actuator", 0.4 * A)) < 1e-5
    assert abs(got(ctrl1, "BR_knee_actuator") - expect("BR_knee_actuator", -0.4 * A)) < 1e-5
    assert abs(got(ctrl1, "FR_knee_actuator") - expect("FR_knee_actuator", 0.0)) < 1e-5


def test_sym_walk_env_episode():
    m = load_opendog("flat")
    env = SymWalkEnv(m)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (22,)
    # settle leaves the robot standing
    assert 0.05 < float(state.physics.qpos[2]) < 0.12
    step = jax.jit(env.step)
    state, trans = step(state, jnp.zeros(4))
    assert np.isfinite(float(trans.reward))
    # phase flips each step (obs cos(pi*phase) = +-1)
    assert abs(float(trans.obs[-1]) + 1.0) < 1e-5  # phase 1 after 1 step


def test_terrain_generation():
    m = load_opendog("terrain")
    t1 = terrain_lib.generate_terrain(jax.random.PRNGKey(3), m)
    assert t1.height.shape == (100, 100)
    h = np.asarray(t1.height)
    # heights live in [base, base+0.3]
    assert h.min() >= 0.0 and h.max() <= 0.302
    t_flat = terrain_lib.flat_terrain(m)
    np.testing.assert_allclose(np.asarray(t_flat.height), 0.151, atol=1e-6)
    # different keys -> different terrains (unless both flat)
    t2 = terrain_lib.generate_terrain(jax.random.PRNGKey(12345), m)
    assert h.std() > 0 or np.asarray(t2.height).std() > 0


def test_terrain_walk_env_smoke():
    m = load_opendog("terrain")
    env = TerrainWalkEnv(m)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (12,)
    state, trans = jax.jit(env.step)(state, jnp.zeros(8))
    assert np.isfinite(float(trans.reward))


def test_jump_env_smoke():
    m = load_go1("jump")
    env = JumpEnv(m)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert obs.shape == (env.obs_size,)
    state, trans = jax.jit(env.step)(state, jnp.zeros(12))
    assert np.isfinite(float(trans.reward)) and float(trans.reward) >= 0


def test_landing_env_starts_descending():
    m = load_go1("landing")
    env = LandingEnv(m)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # descent keyframe: z near 0.6 (go1.xml:227)
    assert abs(float(state.physics.qpos[2]) - 0.6) < 0.15
    step = jax.jit(env.step)
    # hold the home posture while falling (action 0 would command the
    # ctrlrange midpoint — a violent kick).  The descent keyframe actually
    # starts with the feet intersecting the platform (reference scene
    # geometry), so the robot is first ejected upward, then settles onto
    # the 0.4 m-high platform.
    lo, hi = env.ctrlrange[:, 0], env.ctrlrange[:, 1]
    a_home = jnp.asarray(2 * (env.home_ctrl - lo) / (hi - lo) - 1)
    zs = []
    for _ in range(60):
        state, trans = step(state, a_home)
        zs.append(float(state.physics.qpos[2]))
    assert np.all(np.isfinite(zs))
    # settled standing on the platform: top 0.4 + standing height ~0.26
    assert 0.45 < zs[-1] < 0.85, f"final z {zs[-1]:.3f}"

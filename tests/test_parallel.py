import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opendog_tpu.assets import load_opendog
from opendog_tpu.envs import WalkEnv
from opendog_tpu.parallel import env_mesh, make_sharded_ppo, shard_batch
from opendog_tpu.rl import Hyper, MLPActorCritic, PPOConfig


def test_env_mesh_has_8_devices(devices8):
    mesh = env_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_ppo_runs_on_mesh(devices8):
    """DP PPO over the 8-device CPU mesh: one chunk runs, params stay
    replica-consistent across shards."""
    mesh = env_mesh(8)
    m = load_opendog("flat")
    env = WalkEnv(m, frame_skip=2)
    net = MLPActorCritic(action_dim=8, hidden=(16, 16))
    cfg = PPOConfig(num_envs=16, n_steps=4, num_epochs=1, minibatch_size=8)
    init, chunk = make_sharded_ppo(env, net, cfg, mesh)
    state = init(jax.random.PRNGKey(0))
    hyper = Hyper(lr=jnp.float32(1e-4), ent_coef=jnp.float32(0.005))
    state, metrics = chunk(state, hyper)
    assert np.isfinite(float(metrics["mean_reward"]))
    # params replicated: every dp shard identical after the pmean
    p0 = jax.tree.leaves(state.params)[0]
    arr = np.asarray(p0)
    for d in range(1, arr.shape[0]):
        np.testing.assert_allclose(arr[0], arr[d], rtol=1e-6)


def test_sharded_batch_step_matches_single_device(devices8):
    """Sharding the env batch over 8 devices must not change the physics."""
    mesh = env_mesh(8)
    m = load_opendog("flat")
    env = WalkEnv(m, frame_skip=2)
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, obs = jax.vmap(env.reset)(keys)
    actions = jnp.zeros((B, 8))
    single, trans_single = jax.jit(jax.vmap(env.step))(states, actions)

    states_sh = shard_batch(mesh, states)
    actions_sh = shard_batch(mesh, actions)
    sharded, trans_sh = jax.jit(jax.vmap(env.step))(states_sh, actions_sh)
    np.testing.assert_allclose(
        np.asarray(trans_sh.obs), np.asarray(trans_single.obs),
        rtol=1e-5, atol=1e-5,
    )

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
    """DP PPO over the 8-device CPU mesh: one chunk runs and produces
    finite metrics and params."""
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
    for leaf in jax.tree.leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_sharded_ppo_matches_single_device(devices8):
    """THE data-parallel semantics check (VERDICT r1 item 2): an 8-device
    chunk with gradient all-reduce must equal a 1-device chunk on the
    concatenated env batch.  Per-env PRNG keys are sliced from one global
    split, so rollouts match exactly; the update differs only in fp
    reduction order."""
    from opendog_tpu.rl.ppo import make_ppo

    mesh = env_mesh(8)
    m = load_opendog("flat")
    env = WalkEnv(m, frame_skip=2)
    net = MLPActorCritic(action_dim=8, hidden=(16, 16))
    # full-batch minibatch (64 = 4 steps x 16 envs) so the shard-local
    # permutations cannot reorder the global minibatch membership
    cfg = PPOConfig(num_envs=16, n_steps=4, num_epochs=2, minibatch_size=64)
    hyper = Hyper(lr=jnp.float32(3e-3), ent_coef=jnp.float32(0.005))

    init1, chunk1 = make_ppo(env, net, cfg)
    s1 = init1(jax.random.PRNGKey(42))
    s1_new, m1 = jax.jit(chunk1)(s1, hyper)

    initN, chunkN = make_sharded_ppo(env, net, cfg, mesh)
    sN = initN(jax.random.PRNGKey(42))
    sN_new, mN = chunkN(sN, hyper)

    for a, b in zip(jax.tree.leaves(sN_new.params),
                    jax.tree.leaves(s1_new.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    for k in ("mean_reward", "actor_loss", "value_loss", "entropy"):
        np.testing.assert_allclose(float(mN[k]), float(m1[k]),
                                   rtol=1e-4, atol=1e-4)
    # rollout trajectories matched exactly => env states identical
    for a, b in zip(jax.tree.leaves(sN_new.env_states),
                    jax.tree.leaves(s1_new.env_states)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


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

import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.assets import load_opendog
from opendog_tpu.envs import SymWalkEnv, WalkEnv
from opendog_tpu.rl import Hyper, MLPActorCritic, PPOConfig, make_ppo
from opendog_tpu.rl.adaptive import AdaptiveState


def _tiny_env():
    m = load_opendog("flat")
    return WalkEnv(m, frame_skip=2)


def test_ppo_chunk_runs_and_updates_params():
    env = _tiny_env()
    net = MLPActorCritic(action_dim=8, hidden=(32, 32))
    cfg = PPOConfig(num_envs=4, n_steps=8, num_epochs=2,
                    minibatch_size=16, loss="clip")
    init, chunk = make_ppo(env, net, cfg)
    state = init(jax.random.PRNGKey(0))
    hyper = Hyper(lr=jnp.float32(1e-4), ent_coef=jnp.float32(0.005))
    jchunk = jax.jit(chunk)
    before = jax.tree.leaves(state.params)[0].copy()
    state, metrics = jchunk(state, hyper)
    state, metrics = jchunk(state, hyper)
    after = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.update_count) == 2


def test_ppo_plain_loss_variant():
    """The sim2real custom loss (plain PG on normalised GAE advantages,
    sim2real/train.py:553-570) runs on the SymWalkEnv."""
    m = load_opendog("flat")
    env = SymWalkEnv(m)
    net = MLPActorCritic(action_dim=4, hidden=(32, 32))
    cfg = PPOConfig(num_envs=2, n_steps=8, num_epochs=2,
                    minibatch_size=16, loss="plain")
    init, chunk = make_ppo(env, net, cfg)
    state = init(jax.random.PRNGKey(1))
    hyper = Hyper(lr=jnp.float32(1e-4), ent_coef=jnp.float32(0.002))
    state, metrics = jax.jit(chunk)(state, hyper)
    assert np.isfinite(float(metrics["actor_loss"]))


def test_ppo_learning_signal_on_simple_objective():
    """PPO must show a critic learning signal on the walk env: the fraction
    of return variance the critic fails to explain (value_resid_frac, a
    scale-free residual) must shrink across chunks.  Raw value_loss is NOT a
    valid signal here — its magnitude tracks the returns, which grow as the
    policy changes."""
    env = _tiny_env()
    net = MLPActorCritic(action_dim=8, hidden=(32, 32))
    cfg = PPOConfig(num_envs=4, n_steps=16, num_epochs=4,
                    minibatch_size=32, loss="clip")
    init, chunk = make_ppo(env, net, cfg)
    state = init(jax.random.PRNGKey(2))
    hyper = Hyper(lr=jnp.float32(3e-4), ent_coef=jnp.float32(0.0))
    jchunk = jax.jit(chunk)
    fracs = []
    for _ in range(6):
        state, metrics = jchunk(state, hyper)
        fracs.append(float(metrics["value_resid_frac"]))
    # untrained critic leaves ~all variance unexplained; trained critic
    # should explain a solid chunk of it by the last rollout.
    assert min(fracs[3:]) < 0.8 * fracs[0], fracs


def test_adaptive_scheduler_reference_semantics():
    s = AdaptiveState()
    # 10 worsening episodes -> lr shrinks by 0.75 exactly once
    lr0 = s.lr
    shifts = [s.record_episode(r) for r in [10, 9, 8, 7, 6, 5, 4, 3, 2, 1]]
    assert s.lr == max(1e-6, lr0 * 0.75)
    assert shifts[-1] < 0  # std shrink on the check step
    # clamping
    assert AdaptiveState.clamp_log_std(0.0, 10.0) == np.log(0.5)
    assert AdaptiveState.clamp_log_std(0.0, -10.0) == np.log(0.10)

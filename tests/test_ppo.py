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


def test_eval_deterministic_and_freezes_after_termination():
    """make_eval (EvalCallback analog, train/train.py:142-149): the eval
    episode is deterministic (same params+key -> identical metrics), stops
    accumulating reward at termination, and returns a physics trajectory
    whose frames are frozen after episode end."""
    from opendog_tpu.rl.evaluate import make_eval

    env = _tiny_env()
    net = MLPActorCritic(action_dim=8, hidden=(16, 16))
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, env.obs_size)))
    eval_fn = jax.jit(make_eval(env, net, n_steps=40))
    m1, phys1 = eval_fn(params, jax.random.PRNGKey(3))
    m2, phys2 = eval_fn(params, jax.random.PRNGKey(3))
    assert float(m1["episode_return"]) == float(m2["episode_return"])
    n = int(m1["episode_len"])
    assert 0 < n <= 40
    assert np.isfinite(float(m1["forward_x"]))
    qpos = np.asarray(phys1.qpos)
    assert qpos.shape[0] == 40
    if n < 40:  # frozen tail: all post-termination frames identical
        np.testing.assert_array_equal(qpos[n], qpos[-1])


def test_train_entry_eval_best_and_video(tmp_path):
    """train() end-to-end with eval/best-model/video enabled: runs 2 tiny
    chunks, writes eval metrics, a best/ checkpoint, and an eval GIF."""
    import os

    from opendog_tpu.train import train

    train("walk", n_envs=2, n_steps=8, total_chunks=2,
          out_dir=str(tmp_path), seed=0, save_interval=2,
          minibatch_size=8, num_epochs=1, eval_interval=1,
          video_interval=2, eval_steps=10)
    run = tmp_path / "walk_0"
    assert (run / "best").exists() and any((run / "best").iterdir())
    gifs = [f for f in os.listdir(run) if f.startswith("eval_")
            and f.endswith(".gif")]
    assert gifs, os.listdir(run)
    lines = (run / "metrics.jsonl").read_text().splitlines()
    assert any("eval/episode_return" in ln for ln in lines)


def test_layer_norm_extractor_variant():
    """CurstomNetwork.py parity: Linear(50)->LayerNorm->ReLU->Linear(40)
    shared features extractor ahead of both heads."""
    net = MLPActorCritic(action_dim=8, hidden=(16, 16),
                         layer_norm_extractor=True)
    p = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 33)))
    flat = jax.tree_util.tree_leaves_with_path(p)
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("LayerNorm" in n for n in names), names
    mean, log_std, value = net.apply(p, jnp.zeros((4, 33)))
    assert mean.shape == (4, 8) and value.shape == (4,)
    assert np.all(np.isfinite(np.asarray(mean)))

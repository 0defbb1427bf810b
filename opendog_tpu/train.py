"""Training CLI — `python -m opendog_tpu.train <task>`.

Reproduces both reference training entry points on the TPU-native stack:
  * ``walk`` / ``turn`` / ``jump`` / ``landing`` — the SB3 PPO configuration
    (clipped surrogate, lr 1e-4, n_steps 2048/env, batch 512, 10 epochs;
    reference CLI `python -m train.train [walk|jump] --n_envs N`,
    train/train.py:90-130) with vmapped on-device envs replacing
    SubprocVecEnv workers;
  * ``sym`` / ``terrain``   — the custom sim2real stack (plain-PG loss,
    update each 2048 samples x 10 epochs, adaptive lr/entropy/action-std,
    periodic checkpoint + walk.json export; sim2real/train.py:498-598).

Every ``eval_interval`` chunks a deterministic eval episode runs on a
dedicated eval env (SB3 EvalCallback, train/train.py:142-149): metrics go
to TB/JSONL under ``eval/``, the best-return params are kept in
``<run>/best/`` (best_model.zip analog), and — every ``video_interval``
evals — the eval episode is written out as a GIF
(train/VideoRecorder.py:33-77).
"""
from __future__ import annotations

import argparse
import math
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from .assets import load_go1, load_opendog
from .envs import (
    JumpEnv,
    LandingEnv,
    SymWalkEnv,
    TerrainWalkEnv,
    TurnEnv,
    WalkEnv,
)
from .rl import Hyper, MLPActorCritic, PPOConfig, make_ppo
from .rl.adaptive import AdaptiveState
from .rl.evaluate import make_eval
from .sim2real import gait_json
from .utils.checkpoint import Checkpointer
from .utils.metrics import MetricsWriter

TASKS = {
    "walk": dict(model=lambda: load_opendog("flat"), env=WalkEnv,
                 action_dim=8, hidden=(64, 64), squash=False, loss="clip"),
    "turn": dict(model=lambda: load_opendog("flat"), env=TurnEnv,
                 action_dim=8, hidden=(64, 64), squash=False, loss="clip"),
    "jump": dict(model=lambda: load_go1("jump"), env=JumpEnv,
                 action_dim=12, hidden=(64, 64), squash=False, loss="clip"),
    "landing": dict(model=lambda: load_go1("landing"), env=LandingEnv,
                    action_dim=12, hidden=(64, 64), squash=False,
                    loss="clip"),
    "sym": dict(model=lambda: load_opendog("flat"), env=SymWalkEnv,
                action_dim=4, hidden=(512, 256), squash=True, loss="plain"),
    "terrain": dict(model=lambda: load_opendog("terrain"),
                    env=TerrainWalkEnv, action_dim=8, hidden=(1024, 512),
                    squash=True, loss="plain"),
}


def train(
    task: str = "walk",
    n_envs: int = 16,
    n_steps: int = 128,
    total_chunks: int = 100,
    out_dir: str = "runs",
    seed: int = 0,
    save_interval: int = 10,
    minibatch_size: int = 512,
    num_epochs: int = 10,
    eval_interval: int = 10,
    video_interval: int = 5,   # every Nth eval also records a GIF
    eval_steps: int = 500,
    resume: bool = False,      # warm-start params from <run>/ckpt
):
    spec = TASKS[task]
    model = spec["model"]()
    env = spec["env"](model)
    net = MLPActorCritic(action_dim=spec["action_dim"],
                         hidden=spec["hidden"],
                         squash_mean=spec["squash"])
    cfg = PPOConfig(
        num_envs=n_envs, n_steps=n_steps, num_epochs=num_epochs,
        minibatch_size=minibatch_size, loss=spec["loss"],
    )
    init, chunk = make_ppo(env, net, cfg)
    state = init(jax.random.PRNGKey(seed))
    jchunk = jax.jit(chunk)

    run_dir = os.path.join(out_dir, f"{task}_{seed}")
    adaptive = AdaptiveState()
    step0 = 0  # checkpoint-step offset so resumed runs save fresh steps
    if resume:
        rck = Checkpointer(os.path.join(run_dir, "ckpt"))
        # Checkpointer.save skips steps already in all_steps(); without the
        # offset a resumed run whose total_chunks <= the previous latest
        # step would silently never persist its new weights
        step0 = rck.latest_step() or 0
        try:  # full-state checkpoint (params + optimizer + env + RNG)
            prev = rck.restore(template=jax.device_get(state))
            if prev is not None:
                state = jax.tree.map(jnp.asarray, prev)
                print(f"resumed full state from {run_dir}/ckpt", flush=True)
        except Exception:  # older params-only checkpoint
            prev = rck.restore(template=jax.device_get(state.params))
            if prev is not None:
                state = state.replace(
                    params=jax.tree.map(jnp.asarray, prev))
                print(f"resumed params from {run_dir}/ckpt", flush=True)
        apath = os.path.join(run_dir, "adaptive.json")
        if os.path.exists(apath):
            import json

            d = json.load(open(apath))
            adaptive.lr = d["lr"]; adaptive.ent_coef = d["ent_coef"]
            adaptive.episodes_seen = d.get("episodes_seen", 0)
            print(f"resumed adaptive hypers lr={adaptive.lr:.2e}",
                  flush=True)
    writer = MetricsWriter(run_dir)
    ck = Checkpointer(os.path.join(run_dir, "ckpt"))
    ck_best = Checkpointer(os.path.join(run_dir, "best"), max_to_keep=1)
    use_adaptive = spec["loss"] == "plain"
    jeval = jax.jit(make_eval(env, net, eval_steps))
    eval_key = jax.random.PRNGKey(seed + 1000)
    best_return = -float("inf")
    n_evals = 0

    for i in range(total_chunks):
        hyper = Hyper(lr=jnp.float32(adaptive.lr),
                      ent_coef=jnp.float32(adaptive.ent_coef))
        t0 = time.time()
        state, metrics = jchunk(state, hyper)
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["steps_per_sec"] = n_envs * n_steps / (time.time() - t0)
        writer.write(i, metrics, prefix="train")
        if use_adaptive:
            shift = adaptive.record_episode(metrics["sum_reward_per_env"])
            if shift:
                log_std = state.params["params"]["log_std"]
                new = jnp.clip(
                    log_std + shift, math.log(0.10), math.log(0.5)
                )
                state = state.replace(params=dict(
                    params={**state.params["params"], "log_std": new}
                ))
        print(f"chunk {i}: reward/env {metrics['sum_reward_per_env']:.2f} "
              f"lr {adaptive.lr:.1e}", flush=True)
        if eval_interval and (i + 1) % eval_interval == 0:
            eval_key, sub = jax.random.split(eval_key)
            emetrics, ephysics = jeval(state.params, sub)
            emetrics = {k: float(v) for k, v in emetrics.items()}
            writer.write(i, emetrics, prefix="eval")
            n_evals += 1
            print(f"  eval: return {emetrics['episode_return']:.2f} "
                  f"len {emetrics['episode_len']:.0f} "
                  f"fwd_x {emetrics['forward_x']:.3f} m", flush=True)
            if emetrics["episode_return"] > best_return:
                best_return = emetrics["episode_return"]
                ck_best.save(step0 + i + 1, jax.device_get(state.params),
                             force=True)
            if video_interval and n_evals % video_interval == 0:
                from .utils.render import record_rollout
                ephysics = jax.device_get(ephysics)
                n_fr = max(1, int(emetrics["episode_len"]))
                ephysics = jax.tree.map(lambda x: x[:n_fr][::4], ephysics)
                record_rollout(model, ephysics,
                               os.path.join(run_dir, f"eval_{i + 1}.gif"),
                               fps=12)
        if (i + 1) % save_interval == 0:
            # FULL-state checkpoint (params + optimizer + env states +
            # RNG): a fresh process resumes the run exactly — the thing
            # the reference's weights-only saves cannot (SURVEY §5)
            ck.save(step0 + i + 1, jax.device_get(state))
            import json

            with open(os.path.join(run_dir, "adaptive.json"), "w") as f:
                json.dump(dict(lr=adaptive.lr, ent_coef=adaptive.ent_coef,
                               episodes_seen=adaptive.episodes_seen), f)
            if task == "sym":
                def policy(obs, _s=state):
                    mean, _, _ = net.apply(_s.params, obs[None])
                    return mean[0]
                gait_json.generate_walk_json(
                    policy, env,
                    os.path.join(run_dir, f"walk_rl_sym_ep{step0 + i + 1}.json"),
                )
    ck.save(step0 + total_chunks, jax.device_get(state), force=True)
    writer.close()
    ck.close()
    ck_best.close()
    return state


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("task", choices=sorted(TASKS))
    p.add_argument("--n_envs", type=int, default=16)
    p.add_argument("--n_steps", type=int, default=128)
    p.add_argument("--chunks", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="runs")
    p.add_argument("--eval_interval", type=int, default=10)
    p.add_argument("--video_interval", type=int, default=5)
    p.add_argument("--eval_steps", type=int, default=500)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()
    train(args.task, n_envs=args.n_envs, n_steps=args.n_steps,
          total_chunks=args.chunks, out_dir=args.out, seed=args.seed,
          eval_interval=args.eval_interval,
          video_interval=args.video_interval, eval_steps=args.eval_steps,
          resume=args.resume)


if __name__ == "__main__":
    main()

"""Evaluation CLI — `python -m opendog_tpu.eval <task> [--run runs/...]`.

The reference's eval entry (``test/test.py:12-43``) loads the SB3
``best_model``, rolls deterministic steps, live-plots the 4 paw contact
forces, and prints each action in BOTH MuJoCo radians and real-robot
degrees (``ScaleActions.py:73-108``) so the sim<->real mapping can be
sanity-checked.  TPU-native equivalent: restore the best (or a given)
checkpoint, run ``rl.evaluate.make_eval`` deterministic episodes, print
the rad/deg action table, summarize per-paw contact forces, and
optionally write the rollout GIF.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("task", choices=["walk", "turn", "jump", "landing",
                                    "sym", "terrain"])
    p.add_argument("--run", default=None,
                   help="run dir (default runs/<task>_0)")
    p.add_argument("--ckpt", default="best",
                   help="'best', 'latest', or a step number")
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gif", default=None)
    p.add_argument("--print_actions", type=int, default=5,
                   help="print the first N per-step action tables")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from .physics import dynamics
    from .rl.evaluate import make_eval
    from .sim2real.calibration import Calibration
    from .train import TASKS
    from .utils.checkpoint import Checkpointer

    spec = TASKS[args.task]
    model = spec["model"]()
    env = spec["env"](model)
    from .rl import MLPActorCritic

    net = MLPActorCritic(action_dim=spec["action_dim"],
                         hidden=spec["hidden"],
                         squash_mean=spec["squash"])
    run_dir = args.run or os.path.join("runs", f"{args.task}_0")
    sub = "best" if args.ckpt == "best" else "ckpt"
    ck = Checkpointer(os.path.join(run_dir, sub))
    obs_size = getattr(env, "obs_size", None)
    state0 = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, obs_size)))
    step = None if args.ckpt in ("best", "latest") else int(args.ckpt)
    if sub == "best":
        # best/ stores params only (train.py saves state.params there)
        params = ck.restore(step=step, template=jax.device_get(state0))
    else:
        # <run>/ckpt stores the FULL TrainState (params + opt_state + env
        # states + RNG, train.py save_interval path); restore untyped and
        # pick .params — a params-only tree (older runs) lacks opt_state
        raw = ck.restore(step=step)
        if isinstance(raw, dict) and "opt_state" in raw:
            # structural pin: a full TrainState restore must carry params
            # alongside opt_state — if the TrainState fields ever rename,
            # fail loudly instead of silently evaluating the wrong tree
            assert "params" in raw, (
                f"checkpoint has opt_state but no params key "
                f"(keys: {sorted(raw)}) — TrainState layout changed?")
            raw = raw["params"]
        params = raw
    if params is None:
        raise SystemExit(f"no checkpoint found under {run_dir}/{sub}")
    print(f"loaded {run_dir}/{sub} (step {ck.latest_step() if step is None else step})")

    eval_fn = jax.jit(make_eval(env, net, args.steps))
    cal = Calibration(model) if model.nu == 8 else None
    key = jax.random.PRNGKey(args.seed)
    for ep in range(args.episodes):
        key, sub_k = jax.random.split(key)
        metrics, phys = eval_fn(params, sub_k)
        metrics = {k: float(v) for k, v in metrics.items()}
        print(f"episode {ep}: return {metrics['episode_return']:.2f} "
              f"len {metrics['episode_len']:.0f} "
              f"fwd_x {metrics['forward_x']:.3f} m "
              f"terminated {bool(metrics['terminated'])}")
        if ep == 0:
            # action table parity with test/test.py: MuJoCo rad + real deg
            qpos = np.asarray(phys.qpos)
            for t in range(min(args.print_actions,
                               int(metrics["episode_len"]))):
                joints = qpos[t, 7:7 + model.nu] if model.nq - 7 >= model.nu \
                    else qpos[t, 7:]
                line = f"  t={t}: rad {np.round(joints, 3)}"
                if cal is not None:
                    deg = np.asarray(cal.sim_rad_to_real_deg(
                        jnp.asarray(cal.reorder_from_model(joints))))
                    line += f" | deg {np.round(deg, 1)}"
                print(line)
            # per-paw contact summary at the final frame
            last = jax.tree.map(lambda x: x[int(metrics["episode_len"]) - 1],
                                phys)
            _, info = dynamics.step(model, last,
                                    jnp.asarray(model.key_ctrl[0]),
                                    n_substeps=1)
            fw, fb, ic = dynamics.foot_contact_summary(model, info.contact)
            print("  paw contact Fz [N]:",
                  np.round(np.asarray(fw)[:, 2], 2),
                  "in contact:", np.asarray(ic))
        if args.gif and ep == 0:
            from .utils.render import record_rollout

            n = max(1, int(metrics["episode_len"]))
            sel = jax.tree.map(lambda x: x[:n][::4], phys)
            record_rollout(model, jax.device_get(sel), args.gif, fps=12)
            print(f"  wrote {args.gif}")


if __name__ == "__main__":
    main()

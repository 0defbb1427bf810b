#!/usr/bin/env python
"""The price of pipelining lag — VERDICT r2 item 5.

bench.py meets the 50 Hz p99 budget by running the host loop ``lag=3``
ticks deep (act on a 3-tick-old plan, 60 ms of control delay).  That
robustness was asserted, never measured.  This script measures it: the
bench-config trot MPC (go1, K=256, 0.5 s horizon) runs fully ON-DEVICE for
``--ticks`` 50 Hz ticks at each lag in {0, 1, 2, 3, 5}, with the plant
applying the solve from ``lag`` ticks ago (``make_mpc(ctrl_lag=...)`` —
exactly the RealtimeController pipeline semantics).  Reported per lag:
final_x (distance covered), mean velocity-tracking error, trunk-height
band violations (fall rate over seeds), and mean solve cost.

Writes one JSON line per lag + a summary line; ``--out`` saves the JSON.
CPU smoke: ``--smoke`` shrinks the config so tests can pin the plumbing.
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ticks", type=int, default=500)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--lags", type=int, nargs="+", default=[0, 1, 2, 3, 5])
    p.add_argument("--out", default=None)
    p.add_argument("--smoke", action="store_true",
                   help="tiny config for CPU plumbing tests")
    p.add_argument("--compensate", action="store_true",
                   help="delay compensation: solve from the state predicted "
                        "through the queued controls "
                        "(make_mpc(lag_compensation=True))")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from opendog_tpu.assets import load_go1
    from opendog_tpu.physics import make_state
    from opendog_tpu.solvers import MPPIConfig, costs, make_mpc

    def log(msg):
        print(f"[lag_sweep] {msg}", file=sys.stderr, flush=True)

    model = load_go1("flat")
    params = costs.TrotCostParams(desired_vel_xy=(0.5, 0.0),
                                  target_height=0.265)
    cost = costs.trot_cost(model, params,
                           np.asarray(model.key_qpos[0])[7:], legs="go1")
    engine = "pallas" if jax.default_backend() != "cpu" else "xla"
    if args.smoke:
        cfg = MPPIConfig(horizon=6, num_samples=32, n_substeps=2,
                         rollout_dt=0.01, noise_sigma=0.12,
                         temperature=0.3, engine=engine)
    else:
        # the bench.py headline config
        cfg = MPPIConfig(horizon=25, num_samples=256, n_substeps=2,
                         rollout_dt=0.01, noise_sigma=0.12,
                         temperature=0.3, engine=engine)

    desired_vx = params.desired_vel_xy[0]
    results = []
    for lag in args.lags:
        init, tick, run = make_mpc(model, cost, cfg, plant_substeps=10,
                                   ctrl_lag=lag,
                                   lag_compensation=args.compensate)
        jrun = jax.jit(lambda c, _n=args.ticks: run(c, _n))
        finals, vel_errs, costs_mean, falls = [], [], [], 0
        t_solve = None
        for seed in range(args.seeds):
            carry = init(jax.random.PRNGKey(seed),
                         make_state(model, "home"))
            t0 = time.time()
            carry, traj = jrun(carry)
            qpos = np.asarray(traj["qpos"])   # forces completion
            dt_wall = time.time() - t0
            if seed == 0:
                # second run for timing once compiled
                t0 = time.time()
                carry2, traj2 = jrun(init(jax.random.PRNGKey(99),
                                          make_state(model, "home")))
                _ = np.asarray(traj2["qpos"][-1, 0])
                t_solve = (time.time() - t0) / args.ticks
            qvel = np.asarray(traj["qvel"])
            z = qpos[:, 2]
            fell = bool((z < 0.12).any() or (z > 0.5).any())
            falls += fell
            finals.append(float(qpos[-1, 0]))
            vel_errs.append(float(np.sqrt(np.mean(
                (qvel[:, 0] - desired_vx) ** 2))))
            costs_mean.append(float(np.asarray(traj["mean_cost"]).mean()))
        rec = {
            "lag": lag,
            "ticks": args.ticks,
            "seeds": args.seeds,
            "final_x_mean": round(float(np.mean(finals)), 3),
            "final_x_min": round(float(np.min(finals)), 3),
            "vx_rmse": round(float(np.mean(vel_errs)), 4),
            "mean_cost": round(float(np.mean(costs_mean)), 2),
            "fall_rate": round(falls / args.seeds, 3),
            "solves_per_sec": round(1.0 / t_solve, 1) if t_solve else None,
        }
        log(json.dumps(rec))
        results.append(rec)

    base = next((r for r in results if r["lag"] == 0), results[0])
    x3 = next((r["final_x_mean"] for r in results if r["lag"] == 3), None)
    summary = {
        "metric": "lag_sweep",
        "engine": engine,
        "device": str(jax.devices()[0]),
        "compensated": bool(args.compensate),
        "results": results,
        "final_x_lag3_vs_lag0": (
            round(x3 / max(1e-9, base["final_x_mean"]), 3)
            if x3 is not None else None),
    }
    print(json.dumps(summary))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Numerical honesty audit of the op-graph physics path on TPU.

Round-2 VERDICT item 3: env/RL rollouts stepped ``dynamics.step`` with no
precision control, so on TPU they integrated default-precision MXU-rounded
physics (~7e-3 qvel error/substep) while every CPU test validated the exact
path.  ``dynamics.step`` now defaults to
``jax.default_matmul_precision("highest")``; this script measures, on the
current backend:

  * per-substep qvel error vs a CPU-f32 oracle (same process, host backend)
    for precision=None (the OLD behavior: ambient default) and
    precision="highest" (the NEW default) over a batch of randomized
    physical states;
  * an accumulated 50-tick env-class rollout error (10 substeps/tick, held
    trot ctrl) for both settings;
  * throughput of the batched 10-substep tick (B=1024) for both settings —
    the price of honesty.

Writes one JSON line to stdout and (with --out) a JSON artifact.
CPU fallback: on the CPU backend the two settings coincide (f32 dots are
exact there) — the script still runs and records that as a sanity check.
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--ticks", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from opendog_tpu.assets import load_go1
    from opendog_tpu.physics import State, dynamics, make_state

    def log(msg):
        print(f"[precision_audit] {msg}", file=sys.stderr, flush=True)

    m = load_go1("flat")
    cpu = jax.local_devices(backend="cpu")[0]
    backend = jax.default_backend()
    log(f"backend {backend}; oracle on {cpu}")

    # randomized physical batch (same recipe as tests/test_pallas_core.py)
    rng = np.random.default_rng(7)
    B = args.batch
    qpos = np.tile(np.asarray(m.key_qpos[0]), (B, 1)).astype(np.float32)
    qpos[:, :3] += rng.normal(0, 0.01, (B, 3))
    qpos[:, 7:] += rng.normal(0, 0.05, (B, m.nq - 7))
    qvel = rng.normal(0, 0.2, (B, m.nv)).astype(np.float32)
    lo, hi = np.asarray(m.actuator_ctrlrange).T
    ctrl = rng.uniform(lo, hi, (B, m.nu)).astype(np.float32)
    states = State(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                   time=jnp.zeros(B))
    ctrls = jnp.asarray(ctrl)

    def one_substep(prec):
        return jax.vmap(lambda a, c: dynamics.step(
            m, a, c, n_substeps=1, precision=prec)[0])

    # ---- oracle: CPU f32 single substep from the same states ----
    with jax.default_device(cpu):
        ref = jax.jit(one_substep(None))(
            jax.device_put(states, cpu), jax.device_put(ctrls, cpu))
        ref_qvel = np.asarray(ref.qvel)

    results = {"backend": backend, "batch": B}
    for name, prec in (("default", None), ("highest", "highest")):
        out = jax.jit(one_substep(prec))(states, ctrls)
        err = np.abs(np.asarray(out.qvel) - ref_qvel)
        results[f"substep_qvel_err_median_{name}"] = float(np.median(err))
        results[f"substep_qvel_err_max_{name}"] = float(err.max())
        log(f"substep err {name}: median {np.median(err):.3e} "
            f"max {err.max():.3e}")

    # ---- env-class rollout: T ticks x 10 substeps, held home ctrl ----
    s0 = make_state(m, "home")
    home = jnp.asarray(m.key_ctrl[0])

    def rollout(prec):
        def f(s, _):
            s2, _info = dynamics.step(m, s, home, n_substeps=10,
                                      precision=prec)
            return s2, s2.qvel
        def run(s):
            return jax.lax.scan(f, s, None, length=args.ticks)
        return run

    with jax.default_device(cpu):
        _, ref_traj = jax.jit(rollout(None))(jax.device_put(s0, cpu))
        ref_traj = np.asarray(ref_traj)
    for name, prec in (("default", None), ("highest", "highest")):
        _, traj = jax.jit(rollout(prec))(s0)
        err = np.abs(np.asarray(traj) - ref_traj)
        results[f"rollout_qvel_err_final_median_{name}"] = float(
            np.median(err[-1]))
        results[f"rollout_qvel_err_final_max_{name}"] = float(err[-1].max())
        log(f"rollout({args.ticks} ticks) final err {name}: "
            f"median {np.median(err[-1]):.3e} max {err[-1].max():.3e}")

    # ---- throughput: batched 10-substep tick, both settings ----
    for name, prec in (("default", None), ("highest", "highest")):
        tick = jax.jit(jax.vmap(lambda a, c: dynamics.step(
            m, a, c, n_substeps=10, precision=prec)[0]))
        st = tick(states, ctrls)
        _ = float(st.qpos[0, 0])  # force completion over the tunnel
        n = 20
        t0 = time.time()
        for _ in range(n):
            st = tick(st, ctrls)
        _ = float(st.qpos[0, 0])
        dt = time.time() - t0
        results[f"env_ticks_per_sec_{name}"] = round(B * n / dt, 1)
        log(f"throughput {name}: {B * n / dt:.0f} env-ticks/s")

    if results["env_ticks_per_sec_default"] > 0:
        results["highest_throughput_ratio"] = round(
            results["env_ticks_per_sec_highest"]
            / results["env_ticks_per_sec_default"], 3)
    print(json.dumps(results))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: MPC solves/sec/chip + p99 solve latency at the 50 Hz
control budget for the 12-DoF quadruped (BASELINE.json metric).

Config matches BASELINE.json config 2: flat-ground trot tracking, MPPI with
256 rollouts and a 0.5 s horizon (25 control steps x 4 substeps x 5 ms
rollout dt), single chip.  The plant advances at the full 2 ms physics rate
(10 substeps per 50 Hz tick).

Prints ONE JSON line:
  {"metric": ..., "value": solves_per_sec, "unit": "solves/s/chip",
   "vs_baseline": value / 50}
vs_baseline is measured against the 50 Hz real-time requirement (the
reference publishes no benchmark numbers — BASELINE.md; its achieved
end-to-end control rate on hardware is 12.5 Hz, sim2real/run_robot.py:37).
Extra fields carry p99 latency and rollout throughput for the record.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax

    import opendog_tpu  # noqa: F401
    from opendog_tpu.assets import load_go1
    from opendog_tpu.physics import make_state
    from opendog_tpu.solvers import MPPIConfig, costs, make_mpc

    model = load_go1("flat")
    params = costs.TrotCostParams(
        desired_vel_xy=(0.5, 0.0), target_height=0.265
    )
    cost = costs.trot_cost(model, params, np.asarray(model.key_qpos[0])[7:],
                           legs="go1")
    # engine="pallas": the fused TPU substep kernel (ops/pallas_step.py) —
    # 12.5x faster and ~2000x more accurate than the op-graph rollout on
    # TPU v5e (see tests/test_pallas_core.py header for measurements).
    engine = "pallas" if jax.default_backend() != "cpu" else "xla"
    cfg = MPPIConfig(
        horizon=25, num_samples=256, n_substeps=2, rollout_dt=0.01,
        noise_sigma=0.12, temperature=0.3, engine=engine,
    )
    init, tick, run = make_mpc(model, cost, cfg, plant_substeps=10)
    carry = init(jax.random.PRNGKey(0), make_state(model, "home"))

    jtick = jax.jit(tick)
    # warmup / compile
    t0 = time.time()
    carry, out = jtick(carry)
    jax.block_until_ready(out["qpos"])
    compile_s = time.time() - t0

    # (a) host-in-the-loop latency: one tunnel-synced solve per tick — what
    # a host-side robot bridge would observe
    n = 100
    lat = np.zeros(n)
    for i in range(n):
        t0 = time.time()
        carry, out = jtick(carry)
        jax.block_until_ready(out["qpos"])
        lat[i] = time.time() - t0
    p99_ms = float(np.percentile(lat, 99) * 1e3)

    # (b) on-device control loop: the whole 50 Hz MPC loop scanned on-chip
    # (the deployment mode for sim/training) — pure solve throughput
    jrun = jax.jit(lambda c: run(c, 100))
    carry2, traj = jrun(carry)
    jax.block_until_ready(traj["qpos"])
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        carry2, traj = jrun(carry2)
    jax.block_until_ready(traj["qpos"])
    solves_per_sec = 100 * reps / (time.time() - t0)
    # sanity: the controlled robot should still be upright and moving
    qpos = np.asarray(carry2.plant.qpos)
    healthy = bool(0.12 < qpos[2] < 0.5)

    rollouts_per_tick = cfg.num_samples
    result = {
        "metric": "mpc_solves_per_sec_per_chip",
        "value": round(float(solves_per_sec), 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(float(solves_per_sec) / 50.0, 3),
        "host_loop_p99_latency_ms": round(p99_ms, 2),
        "host_loop_mean_latency_ms": round(float(lat.mean() * 1e3), 2),
        # deployment mode is the on-device scanned loop; host-loop numbers
        # above are dominated by the axon tunnel RPC (~5 ms/roundtrip
        # floor), not solve time
        "on_device_solve_ms": round(1e3 / float(solves_per_sec), 3),
        "rollouts_per_tick": rollouts_per_tick,
        "horizon_s": cfg.horizon * cfg.n_substeps * cfg.rollout_dt,
        "compile_s": round(compile_s, 1),
        "plant_healthy": healthy,
        "final_x": round(float(qpos[0]), 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())

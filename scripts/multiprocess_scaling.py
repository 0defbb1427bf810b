#!/usr/bin/env python
"""MEASURED multi-process scaling wall-clock (VERDICT r3 items 3/7).

Spawns N OS processes (1 virtual CPU device each), brings up
``jax.distributed`` exactly as a pod slice would, and measures wall-clock
for the real sharded programs:

  * sample-sharded MPPI (``mppi.make_solver(mesh=)``) — WEAK scaling:
    K = 64 samples per device, receding-horizon loop scanned on-device;
  * dp-sharded batched env rollout (the 32k-scenario program shape) —
    WEAK scaling: fixed envs per device.

These are PLUMBING measurements on CPU devices over host memory — they
prove the multi-process collectives execute and bound their overhead; they
are NOT TPU perf numbers (no ICI here; see SCALING.json for the modeled
ICI projections and BENCH_SUITE.json for single-chip measurements).

Writes runs/multiprocess_scaling/metrics.json.
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time

WORKER = r"""
import json, os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opendog_tpu.parallel import initialize_distributed

coord, pid, nproc, mode = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                           sys.argv[4])
assert initialize_distributed(coord, num_processes=nproc, process_id=pid)
n_dev = len(jax.devices())
assert n_dev == nproc, (n_dev, nproc)
mesh_axis = "mp" if mode == "mppi" else "dp"
mesh = Mesh(np.array(jax.devices()), axis_names=(mesh_axis,))
rep = NamedSharding(mesh, P())

def replicated(x):
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

from opendog_tpu.assets import load_opendog
m = load_opendog("flat")

if mode == "mppi":
    from opendog_tpu.physics import make_state
    from opendog_tpu.solvers import MPPIConfig, costs, mppi

    samples_per_dev = int(os.environ.get("OPENDOG_SCALING_SAMPLES", "64"))
    horizon = int(os.environ.get("OPENDOG_SCALING_HORIZON", "10"))
    cost = costs.standing_cost(m, 0.0694, np.asarray(m.key_qpos[0])[7:])
    cfg = MPPIConfig(horizon=horizon, num_samples=samples_per_dev * nproc,
                     n_substeps=2, rollout_dt=0.01, noise_sigma=0.08)
    solve = mppi.make_solver(m, cost, cfg, mesh=mesh)
    state = jax.tree.map(replicated, make_state(m, "home"))
    ms0 = jax.tree.map(replicated, mppi.init_state(m, cfg))
    key = replicated(jax.random.PRNGKey(0))

    def run_n(ms, key, n):
        def tick(carry, _):
            ms, key = carry
            key, k = jax.random.split(key)
            ctrl, ms, stats = solve(state, ms, k)
            return (ms, key), stats["best_cost"]
        (ms, _), bc = jax.lax.scan(tick, (ms, key), None, length=n)
        return bc

    N = 10
    jrun = jax.jit(run_n, static_argnums=2)
    bc = jrun(ms0, key, N)
    _ = float(np.asarray(bc.addressable_data(0))[-1])   # compile + sync
    t0 = time.time()
    bc = jrun(ms0, key, N)
    last = float(np.asarray(bc.addressable_data(0))[-1])
    dt = time.time() - t0
    out = dict(mode=mode, nproc=nproc, solves_per_sec=round(N / dt, 2),
               samples_per_solve=cfg.num_samples, best_cost=round(last, 3),
               finite=bool(np.isfinite(last)))
else:
    from opendog_tpu.physics import State, dynamics

    B = 128 * nproc
    sh = NamedSharding(mesh, P("dp"))
    qpos_full = np.tile(np.asarray(m.key_qpos[0], np.float32), (B, 1))
    qpos_full += 0.02 * np.random.default_rng(0).standard_normal(
        qpos_full.shape).astype(np.float32)
    def put(full):
        return jax.make_array_from_callback(full.shape, sh,
                                            lambda idx: full[idx])
    states = State(qpos=put(qpos_full),
                   qvel=put(np.zeros((B, m.nv), np.float32)),
                   time=put(np.zeros(B, np.float32)))
    ctrls = put(np.tile(np.asarray(m.key_ctrl[0], np.float32), (B, 1)))

    def run_n(st, cs, n):
        # cs passed as an argument: a multi-process global array cannot be
        # closed over inside jit
        def tick(s, _):
            s2 = jax.vmap(lambda a, c: dynamics.step(
                m, a, c, None, n_substeps=10)[0])(s, cs)
            return s2, ()
        s2, _ = jax.lax.scan(tick, st, None, length=n)
        return s2

    N = 10
    jrun = jax.jit(run_n, static_argnums=2)
    states2 = jrun(states, ctrls, N)
    _ = float(np.asarray(states2.qpos.addressable_data(0))[0, 2])
    t0 = time.time()
    states2 = jrun(states2, ctrls, N)
    z = float(np.asarray(states2.qpos.addressable_data(0))[0, 2])
    dt = time.time() - t0
    out = dict(mode=mode, nproc=nproc,
               env_ticks_per_sec=round(B * N / dt, 1),
               envs=B, finite=bool(np.isfinite(z)))

if pid == 0:
    print("RESULT " + json.dumps(out), flush=True)
jax.distributed.shutdown()
"""


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_case(nproc, mode, timeout_s=1200):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        script = os.path.join(d, "worker.py")
        with open(script, "w") as f:
            f.write(WORKER)
        coord = f"127.0.0.1:{free_port()}"
        env = dict(os.environ)
        env.update(
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            PYTHONPATH=os.pathsep.join(
                [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
                + env.get("PYTHONPATH", "").split(os.pathsep)),
        )
        procs = [
            subprocess.Popen(
                [sys.executable, script, coord, str(pid), str(nproc), mode],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True)
            for pid in range(nproc)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=timeout_s)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        for pid, (p, out) in enumerate(zip(procs, outs)):
            if p.returncode != 0:
                raise RuntimeError(f"proc {pid}/{nproc} {mode}:\n{out}")
        for ln in outs[0].splitlines():
            if ln.startswith("RESULT "):
                return json.loads(ln[len("RESULT "):])
    raise RuntimeError(f"no RESULT line for {mode} nproc={nproc}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--out", default="runs/multiprocess_scaling")
    args = ap.parse_args()

    res = dict(
        provenance=dict(
            recorded_at=time.strftime("%Y-%m-%dT%H:%M:%S"),
            plumbing_not_perf=True,
            host_cores=os.cpu_count(),
            note=("N OS processes x 1 virtual CPU device over host memory "
                  "(jax.distributed): proves the cross-process sharded "
                  "programs execute end-to-end and bounds their overhead. "
                  "NOT TPU numbers — and the weak-scaling efficiencies at "
                  "N > host cores measure CPU OVERSUBSCRIPTION of this "
                  "shared host (every process competes for the same "
                  "cores), not collective cost.  Real ICI projections are "
                  "modeled in SCALING.json; single-chip measurements in "
                  "BENCH_SUITE.json."),
        ),
        mppi_weak_scaling=[],
        env_rollout_weak_scaling=[],
    )
    for mode, key in (("mppi", "mppi_weak_scaling"),
                      ("envs", "env_rollout_weak_scaling")):
        base = None
        for n in args.nprocs:
            r = run_case(n, mode)
            metric = r.get("solves_per_sec") or r.get("env_ticks_per_sec")
            if mode == "envs":
                metric = metric / r["envs"]  # per-env rate (weak scaling)
            if base is None:
                base = metric
            r["weak_scaling_efficiency"] = round(metric / base, 3)
            res[key].append(r)
            print(json.dumps(r), flush=True)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(f"wrote {args.out}/metrics.json", flush=True)


if __name__ == "__main__":
    main()

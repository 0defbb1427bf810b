#!/usr/bin/env python
"""32k-scenario command-conditioned distill round, DP-sharded over the
device mesh (BASELINE.json config 5's scale axis; VERDICT r3 item 3).

Runs ONE DAgger collect+train round of the command-conditioned MPC
distiller (rl/distill.py + rl/distill_zoo.cmd_distill_setup) at
S = 32768 scenarios: every scenario carries its own velocity command from
the full curriculum grid, its own MPPI expert plans for that command, and
the student trains on the aggregate (obs, expert-label) set — the same
program scripts/distill_cmd.py iterates at S = 8, inflated 4096x and
sharded along the scenario axis with ``NamedSharding(P("dp"))``.

Two provenance-labeled modes (pick via JAX_PLATFORMS, CLAUDE.md rules):

* **cpu** — 8 virtual CPU devices (one process): the committed
  PLUMBING artifact.  Proves the 32k-scenario program compiles, shards
  4096 scenarios/device, executes the cross-device collectives, and
  produces finite losses end-to-end.  Tiny MPPI config (CPU op-graph
  physics is ~400x slower than the fused TPU kernel) — NOT a perf number.
* **tpu** — one real v5e chip: the SCALE artifact.  Full 0.5 s-horizon
  experts at reduced sample count (32768 scenarios x 16 samples = 524288
  concurrent rollout lanes through the fused Pallas substep), measured
  wall-clock per tick.

Reference anchor: the reference trains 4 SubprocVecEnv workers
(train/train.py:81-97) — this program runs 32768 concurrent
domain-varied scenarios, the TPU-native replacement for process-level
env parallelism (SURVEY.md §2.8 DP row).

Writes runs/distill_cmd_32k/metrics.json (merging per-backend records).
"""
import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", type=int, default=32768)
    ap.add_argument("--ticks", type=int, default=None,
                    help="collect ticks (default: 2 cpu / 4 tpu)")
    ap.add_argument("--out", default="runs/distill_cmd_32k")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from opendog_tpu.physics import State, make_state
    from opendog_tpu.physics import dynamics as _dyn
    from opendog_tpu.rl.distill import DistillConfig, make_distiller
    from opendog_tpu.rl.distill_zoo import cmd_distill_setup
    from opendog_tpu.solvers import MPPIConfig, mppi as mppi_mod

    backend = jax.default_backend()
    on_tpu = backend != "cpu"
    devices = jax.devices()
    n_dev = len(devices)
    S = args.scenarios
    assert S % n_dev == 0, (S, n_dev)
    ticks = args.ticks or (4 if on_tpu else 2)

    engine = "pallas" if on_tpu else "xla"
    setup = cmd_distill_setup("go1", engine=engine)
    m = setup.model
    if on_tpu:
        # full-horizon experts, sample count cut 512 -> 16 so the planner
        # holds S*K = 524288 concurrent lanes (quality-reduced expert —
        # this artifact measures SCALE, scripts/distill_cmd.py measures
        # student quality at full K)
        mcfg = setup.mppi_config._replace(num_samples=16)
        plant_substeps = 10
    else:
        mcfg = MPPIConfig(horizon=3, num_samples=8, n_substeps=1,
                          rollout_dt=0.01, noise_sigma=0.1, engine="xla")
        plant_substeps = 5

    dcfg = DistillConfig(num_scenarios=S, rollout_ticks=ticks,
                         rounds=1, lr=1e-3, batch_size=4096,
                         epochs_per_round=2)
    init, _, _, collect, train_on = make_distiller(
        m, setup.cost, setup.obs_fn, setup.net, mppi_config=mcfg,
        config=dcfg, plant_substeps=plant_substeps,
        action_ref_fn=setup.u_ref, with_prev_ctrl=True, command_dim=3,
        plant_k_tile=min(S, 512),
        anchor_w=15.0)  # anchored experts, same recipe as distill_cmd.py

    # ---- sharded inputs: scenarios split along the dp mesh axis ----
    mesh = Mesh(np.asarray(devices), axis_names=("dp",))
    shard = NamedSharding(mesh, P("dp"))
    rep = NamedSharding(mesh, P())

    s0 = make_state(m, "home")
    hold = jnp.asarray(np.clip(np.asarray(m.key_ctrl[0], np.float32),
                               np.asarray(m.actuator_ctrlrange)[:, 0],
                               np.asarray(m.actuator_ctrlrange)[:, 1]))
    s0, _ = jax.jit(lambda st: _dyn.step(m, st, hold, None,
                                         n_substeps=150))(s0)
    rng = np.random.default_rng(0)
    qpos0 = np.tile(np.asarray(s0.qpos, np.float32), (S, 1))
    qpos0[:, 7:] += 0.03 * rng.standard_normal((S, m.nq - 7))
    qpos0[:, 2] += 0.01 * rng.standard_normal(S)
    plants = State(
        qpos=jax.device_put(qpos0.astype(np.float32), shard),
        qvel=jax.device_put(np.zeros((S, m.nv), np.float32), shard),
        time=jax.device_put(np.zeros(S, np.float32), shard))

    # full curriculum grid, balanced across scenarios (same modes as
    # scripts/distill_cmd.py CURRICULUM)
    from scripts.distill_cmd import CURRICULUM
    modes = (np.arange(S) * len(CURRICULUM)) // S
    cmds_np = np.stack(
        [np.array([CURRICULUM[i][0] for i in modes], np.float32),
         np.zeros(S, np.float32),
         np.array([CURRICULUM[i][1] for i in modes], np.float32)], axis=1)
    cmds = jax.device_put(cmds_np, shard)

    nominal = np.tile(np.asarray(m.key_ctrl[0], np.float32)[None, None],
                      (S, mcfg.horizon, 1))
    mstates = mppi_mod.MPPIState(nominal=jax.device_put(nominal, shard))

    dstate = init(jax.random.PRNGKey(0), s0)
    dstate = jax.device_put(dstate, rep)

    jcollect = jax.jit(collect)
    t0 = time.time()
    plants2, _, key, obs, labels = jcollect(
        dstate, plants, mstates, jnp.float32(1.0), None, cmds)
    obs.block_until_ready()
    labels_np = np.asarray(labels)
    t_collect = time.time() - t0
    assert np.isfinite(labels_np).all(), "non-finite expert labels"
    assert np.isfinite(np.asarray(obs)).all(), "non-finite observations"

    t1 = time.time()
    dstate, loss = jax.jit(train_on)(dstate, obs, labels,
                                     jax.random.PRNGKey(1))
    loss = float(loss)
    t_train = time.time() - t1
    assert np.isfinite(loss), loss

    zs = np.asarray(plants2.qpos[:, 2])
    rec = dict(
        backend=backend,
        devices=n_dev,
        scenarios=S,
        scenarios_per_device=S // n_dev,
        ticks=ticks,
        expert_samples=mcfg.num_samples,
        horizon=mcfg.horizon,
        concurrent_rollout_lanes=S * mcfg.num_samples,
        labels_collected=int(labels_np.shape[0]),
        collect_wall_s=round(t_collect, 2),
        labels_per_sec=round(labels_np.shape[0] / t_collect, 1),
        train_wall_s=round(t_train, 2),
        distill_loss=round(loss, 4),
        all_finite=True,
        plants_upright_frac=round(float(((zs > 0.1) & (zs < 0.5)).mean()),
                                  3),
        provenance=("CPU-mesh PLUMBING (tiny experts, no perf claim)"
                    if not on_tpu else
                    "one v5e chip, full-horizon experts at K=16"),
        recorded_at=time.strftime("%Y-%m-%dT%H:%M:%S"),
    )
    print(json.dumps(rec), flush=True)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "metrics.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged[backend] = rec
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()

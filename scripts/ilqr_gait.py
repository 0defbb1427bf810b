#!/usr/bin/env python
"""Contact-scheduled whole-body iLQR demos (BASELINE config 3 — "iLQR MPC
with contact schedule"; VERDICT r3 item 2): the solver LOCOMOTES, not just
stands.

Arms:
  trot     — go1 trots under the 1 Hz-replan / 50 Hz-track iLQR cycle
             (make_ilqr_tracker) with a two-slot alternating-diagonal
             contact schedule (costs.trot_schedule).
  landing  — go1 drops from the ``descent`` keyframe (z=0.6) over flat
             ground; a front-then-back landing schedule
             (costs.landing_schedule; reference phase semantics
             rewards/landing_environment_reward_calc.py:107-135) lands it
             upright; per-foot touchdown ordering is measured by replaying
             the executed controls through the plant.

Writes runs/ilqr_gait/metrics.json.  Runs on TPU or CPU (compiles are the
slow part either way; go1 iLQR ~100 s on CPU).
"""
import argparse
import json
import os
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="*", default=["trot", "landing"])
    ap.add_argument("--trot_cycles", type=int, default=6)
    ap.add_argument("--out", default="runs/ilqr_gait")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from opendog_tpu.assets import load_go1
    from opendog_tpu.physics import make_state, dynamics, spatial
    from opendog_tpu.solvers import costs
    from opendog_tpu.solvers.ilqr import ILQRConfig
    from opendog_tpu.solvers.mpc import make_ilqr_tracker

    m = load_go1("flat")
    home_j = np.asarray(m.key_qpos[0])[7:]
    res = {}

    if "trot" in args.arms:
        pc = costs.TrotCostParams(desired_vel_xy=(0.5, 0.0),
                                  target_height=0.265)
        sched = costs.trot_schedule(pc, legs="go1")
        cost = costs.contact_schedule_cost(m, sched, pc, home_j,
                                           legs="go1")
        # iterations=6: 4 is under-converged — plan error accumulates and
        # the trot collapses by cycle ~7 (the bench-3b diagnosis); 6 holds
        # trunk height for 10+ cycles on CPU f32
        icfg = ILQRConfig(horizon=25, n_substeps=2, rollout_dt=0.01,
                          iterations=6)
        cycle = jax.jit(make_ilqr_tracker(m, cost, icfg, track_ticks=25,
                                          plant_substeps=10))
        s = make_state(m, "home")
        s, _ = dynamics.step(m, s, jnp.asarray(m.key_ctrl[0]), None,
                             n_substeps=200)
        s = s.replace(time=jnp.zeros(()))
        U = jnp.tile(jnp.asarray(m.key_ctrl[0])[None], (icfg.horizon, 1))
        t0 = time.time()
        plant, U, traj = cycle(s, U)
        compile_s = time.time() - t0
        x_start = float(np.asarray(plant.qpos)[0])
        zs = [float(np.asarray(plant.qpos)[2])]
        t0 = time.time()
        for _ in range(args.trot_cycles - 1):
            plant, U, traj = cycle(plant, U)
            zs.append(float(np.asarray(plant.qpos)[2]))
        wall = time.time() - t0
        q = np.asarray(plant.qpos)
        dist = float(q[0]) - x_start
        sim_s = 0.5 * (args.trot_cycles - 1)
        res["trot"] = dict(
            cycles=args.trot_cycles,
            final_x=round(float(q[0]), 3),
            distance_m=round(dist, 3),
            sim_seconds=round(sim_s, 2),
            mean_speed_mps=round(dist / sim_s, 3),
            trunk_z_band=[round(min(zs), 3), round(max(zs), 3)],
            healthy=bool(all(0.15 < z < 0.4 for z in zs)),
            locomotes=bool(dist > 0.15),
            cycle_seconds=round(wall / (args.trot_cycles - 1), 3),
            realtime_factor=round(0.5 / (wall / (args.trot_cycles - 1)), 2),
            compile_s=round(compile_s, 1),
        )
        print(json.dumps({"arm": "trot", **res["trot"]}), flush=True)

    if "landing" in args.arms:
        # landing-config sweep winner (.scratch/landing_sweep.py,
        # 2026-08-19): ordered touchdown + upright recovery
        pc = costs.TrotCostParams(desired_vel_xy=(0.0, 0.0),
                                  target_height=0.265, knee_lift=0.5,
                                  w_gait=20.0, w_height=40.0,
                                  w_upright=60.0)
        sched = costs.landing_schedule(slot_dt=0.25)
        cost = costs.contact_schedule_cost(m, sched, pc, home_j,
                                           legs="go1", w_stance_vel=0.1)
        icfg = ILQRConfig(horizon=40, n_substeps=2, rollout_dt=0.01,
                          iterations=5)
        cycle = jax.jit(make_ilqr_tracker(m, cost, icfg, track_ticks=40,
                                          plant_substeps=10))
        s = make_state(m, "descent")  # z = 0.6 drop
        U = jnp.tile(jnp.asarray(m.key_ctrl[0])[None], (icfg.horizon, 1))
        t0 = time.time()
        plant, U, traj1 = cycle(s, U)
        compile_s = time.time() - t0
        plant, U, traj2 = cycle(plant, U)
        q = np.asarray(plant.qpos)

        ctrls = jnp.concatenate([traj1["ctrl"], traj2["ctrl"]])

        @jax.jit
        def replay(ctrls):
            def tick(st, c):
                st2, info = dynamics.step(m, st, c, None, n_substeps=10)
                _, _, ic = dynamics.foot_contact_summary(m, info.contact)
                return st2, (st2.qpos[2], ic)
            _, (zs, ics) = jax.lax.scan(tick, make_state(m, "descent"),
                                        ctrls)
            return zs, ics

        zs, ics = replay(ctrls)
        zs = np.asarray(zs); ics = np.asarray(ics)
        touch = [float(np.argmax(ics[:, f]) * 0.02)
                 if ics[:, f].any() else None for f in range(4)]
        front = [t for t in touch[:2] if t is not None]
        rear = [t for t in touch[2:] if t is not None]
        roll, pitch, yaw = np.asarray(spatial.euler_from_quat(
            jnp.asarray(q[3:7])))
        res["landing"] = dict(
            drop_height_m=0.6,
            final_z=round(float(q[2]), 3),
            min_z=round(float(zs.min()), 3),
            final_roll_pitch=[round(float(roll), 3), round(float(pitch), 3)],
            upright=bool(abs(roll) < 0.3 and abs(pitch) < 0.3
                         and 0.2 < q[2] < 0.35),
            touchdown_s=dict(FR=touch[0], FL=touch[1],
                             RR=touch[2], RL=touch[3]),
            front_before_rear=bool(
                front and rear and max(front) <= min(rear)
                and min(rear) > min(front)),
            compile_s=round(compile_s, 1),
        )
        print(json.dumps({"arm": "landing", **res["landing"]}), flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(f"wrote {args.out}/metrics.json", flush=True)
    return res


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Terrain planning fidelity — VERDICT r2 item 6.

The fused-kernel terrain MPC plans on the LOCAL TANGENT PLANE of the
heightfield at the plant position (``solvers/mppi.py::_local_plane``) while
the plant integrates exact bilinear terrain.  Suite config 2c only reported
solves/s; this script quantifies the quality of the approximation: on the
same procedurally rough terrains (same seeds), walk the trot MPC for
``--ticks`` 50 Hz ticks with

  * planner = exact bilinear terrain  (engine="xla" op-graph rollouts), vs
  * planner = local tangent plane     (engine="pallas" fused rollouts,
                                       TPU backend), or — on CPU / with
    ``--plane_xla`` — an op-graph arm whose rollouts see a STATIC tangent
    plane built at the episode start (a strictly cruder stand-in that
    bounds the local-plane approximation from below).

Per arm and seed: distance covered, realized plant cost (the step cost
evaluated on the actual plant trajectory, not the planner's internal
estimate), and success (trunk stayed within the height band RELATIVE to
the terrain under it).  Summary compares the arms.
"""
import argparse
import json
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ticks", type=int, default=250)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 2, 4])
    p.add_argument("--out", default=None)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--plane_xla", action="store_true",
                   help="use the static-plane op-graph arm even on TPU")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from opendog_tpu.assets import load_opendog
    from opendog_tpu.physics import State, make_state
    from opendog_tpu.physics.dynamics import _terrain_height_normal
    from opendog_tpu.physics.model import Terrain
    from opendog_tpu.physics.terrain import generate_terrain
    from opendog_tpu.solvers import MPPIConfig, costs, make_mpc

    def log(msg):
        print(f"[terrain_fidelity] {msg}", file=sys.stderr, flush=True)

    m = load_opendog("terrain")
    home_j = np.asarray(m.key_qpos[0])[7:]
    base_h = 0.151           # flat-episode terrain height (terrain.py)
    pc = costs.TrotCostParams(desired_vel_xy=(0.2, 0.0),
                              target_height=0.0665 + base_h,
                              thigh_amp=0.12, knee_lift=0.25, w_height=80.0)
    ticks = 6 if args.smoke else args.ticks
    seeds = args.seeds[:1] if args.smoke else args.seeds

    if args.smoke:
        base_cfg = dict(horizon=5, num_samples=16, n_substeps=1,
                        rollout_dt=0.01, noise_sigma=0.10, temperature=0.2)
    else:
        base_cfg = dict(horizon=25, num_samples=256, n_substeps=2,
                        rollout_dt=0.01, noise_sigma=0.10, temperature=0.2)

    on_tpu = jax.default_backend() != "cpu"
    use_pallas_plane = on_tpu and not args.plane_xla

    def rough_terrain(seed):
        """Deterministic non-flat terrain (skip flat 50% draws)."""
        k = seed
        while True:
            t = generate_terrain(jax.random.PRNGKey(k), m)
            if float(t.height.max() - t.height.min()) > 0.05:
                return t, k
            k += 100

    def static_plane(terr):
        """2x2 heightfield whose bilinear interp IS the tangent plane of
        ``terr`` at the start position (origin)."""
        h0, n = _terrain_height_normal(m, terr, jnp.zeros((1, 2)))
        h0, n = float(h0[0]), np.asarray(n[0])
        dhdx, dhdy = -n[0] / n[2], -n[1] / n[2]
        sx, sy = float(m.hfield_size[0]), float(m.hfield_size[1])
        xs = np.array([-sx, sx])
        ys = np.array([-sy, sy])
        grid = h0 + dhdx * xs[None, :] + dhdy * ys[:, None]
        return Terrain(height=jnp.asarray(grid, jnp.float32))

    def run_arm(engine_name, terr, seed, cost):
        plane_mode = "trunk"
        if engine_name == "exact":
            cfg = MPPIConfig(engine="xla", **base_cfg)
            planner_terrain = terr
        elif engine_name == "local_plane":
            cfg = MPPIConfig(engine="pallas", **base_cfg)
            planner_terrain = terr   # pallas path re-planes per solve
        elif engine_name == "per_geom":
            # per-geom tangent planes (each paw's own local plane) — the
            # highest-fidelity kernel terrain mode, with_plane="per_geom"
            cfg = MPPIConfig(engine="pallas", **base_cfg)
            planner_terrain = terr
            plane_mode = "per_geom"
        else:  # static_plane (op-graph stand-in, crudest arm)
            cfg = MPPIConfig(engine="xla", **base_cfg)
            planner_terrain = static_plane(terr)

        # NB: planner and plant terrains differ in the plane arms; the
        # plant ALWAYS integrates the exact bilinear terrain.  make_mpc
        # couples them, so build solver and plant loop explicitly.
        from opendog_tpu.physics import dynamics
        from opendog_tpu.solvers import mppi as mppi_mod

        solve = mppi_mod.make_solver(m, cost, cfg, terrain=planner_terrain,
                                     plane_mode=plane_mode)

        def tick(carry, _):
            st, ms, key, prev = carry
            key, sub = jax.random.split(key)
            ctrl, ms2, stats = solve(st, ms, sub)
            st2, _info = dynamics.step(m, st, ctrl, terr, n_substeps=10)
            c_real = cost(st2, ctrl, prev)
            return (st2, ms2, key, ctrl), dict(
                qpos=st2.qpos, cost=c_real, best=stats["best_cost"])

        # start standing ON the local terrain: place the home pose above
        # the spawn height, then SETTLE under held home ctrl (the
        # reference settles 100 steps after keyframe reset,
        # sim2real/train.py:209) so both arms begin from the same
        # physically-consistent stance
        h_start, _ = _terrain_height_normal(m, terr, jnp.zeros((1, 2)))
        s0 = make_state(m, "home")
        s0 = s0.replace(qpos=s0.qpos.at[2].set(0.08 + float(h_start[0])))
        prev0 = jnp.asarray(np.clip(
            np.asarray(m.key_ctrl[0], np.float32),
            np.asarray(m.actuator_ctrlrange)[:, 0],
            np.asarray(m.actuator_ctrlrange)[:, 1]))
        settle = jax.jit(lambda st: jax.lax.scan(
            lambda s, _: (dynamics.step(m, s, prev0, terr,
                                        n_substeps=10)[0], None),
            st, None, length=25)[0])
        s0 = settle(s0)
        ms0 = mppi_mod.init_state(m, cfg)
        run = jax.jit(lambda c: jax.lax.scan(tick, c, None, length=ticks))
        (_sf, _, _, _), traj = run(
            (s0, ms0, jax.random.PRNGKey(seed), prev0))
        qpos = np.asarray(traj["qpos"])
        c_real = np.asarray(traj["cost"])
        # success: trunk height relative to terrain under it stays in band
        h_under, _n = _terrain_height_normal(
            m, terr, jnp.asarray(qpos[:, :2]))
        rel_z = qpos[:, 2] - np.asarray(h_under)
        success = bool(np.isfinite(qpos).all()
                       and (rel_z > 0.03).all() and (rel_z < 0.15).all())
        return dict(
            final_x=round(float(qpos[-1, 0]), 4),
            realized_cost_mean=round(float(c_real.mean()), 2),
            min_rel_z=round(float(rel_z.min()), 4),
            success=success,
        )

    arms = (["exact", "local_plane", "per_geom"] if use_pallas_plane
            else ["exact", "static_plane"])
    per_arm = {a: [] for a in arms}
    for seed in seeds:
        terr, k = rough_terrain(seed)
        relief = float(terr.height.max() - terr.height.min())
        h_start0, _ = _terrain_height_normal(m, terr, jnp.zeros((1, 2)))
        cost = costs.trot_cost(
            m, pc._replace(target_height=0.0665 + float(h_start0[0])),
            home_j, legs="opendog")
        for a in arms:
            r = run_arm(a, terr, seed, cost)
            r.update(seed=seed, terrain_key=k, relief=round(relief, 3))
            per_arm[a].append(r)
            log(f"{a} seed {seed}: {json.dumps(r)}")

    def agg(rs):
        return dict(
            final_x_mean=round(float(np.mean([r["final_x"] for r in rs])),
                               4),
            realized_cost_mean=round(float(np.mean(
                [r["realized_cost_mean"] for r in rs])), 2),
            success_rate=round(float(np.mean(
                [r["success"] for r in rs])), 3),
        )

    plane_arm = arms[1]
    summary = {
        "metric": "terrain_planning_fidelity",
        "ticks": ticks,
        "plane_arm": plane_arm,
        "exact": agg(per_arm["exact"]),
        "per_seed": per_arm,
        "device": str(jax.devices()[0]),
    }
    for a in arms[1:]:
        summary[a] = agg(per_arm[a])
    e, q = summary["exact"], summary[plane_arm]
    summary["distance_ratio_plane_vs_exact"] = round(
        q["final_x_mean"] / e["final_x_mean"], 3) if e["final_x_mean"] else None
    summary["cost_ratio_plane_vs_exact"] = round(
        q["realized_cost_mean"] / e["realized_cost_mean"], 3) \
        if e["realized_cost_mean"] else None
    if "per_geom" in summary:
        g = summary["per_geom"]
        summary["distance_ratio_pergeom_vs_exact"] = round(
            g["final_x_mean"] / e["final_x_mean"], 3) \
            if e["final_x_mean"] else None
        summary["cost_ratio_pergeom_vs_exact"] = round(
            g["realized_cost_mean"] / e["realized_cost_mean"], 3) \
            if e["realized_cost_mean"] else None
    print(json.dumps(summary))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()

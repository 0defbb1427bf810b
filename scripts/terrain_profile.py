#!/usr/bin/env python
"""Decompose the bench-suite 2c terrain-MPPI tick (VERDICT r4 item 8).

Config 2c (terrain local-plane MPPI, 256 samples) runs ~632 solves/s vs
~1281 for the flat go1 trot (config 2).  This script times each piece of
the 2c tick in isolation on the same device so the gap can be attributed:

  solve_only      — MPPI solve (pallas rollouts w/ per-lane planes), no plant
  plant_only      — one 50 Hz plant tick (10 XLA substeps, exact bilinear
                    terrain contact) with no solver
  plane_only      — the per-tick local-plane computation
  full_tick       — the composed mpc tick (should ~= solve + plant)
  flat_solve_only — same robot/cost WITHOUT terrain (flat pallas), for the
                    kernel-side cost of the plane lanes

Writes runs/terrain_profile/metrics.json.
"""
import json
import os
import time

import numpy as np


def fetch(x):
    import jax
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf).ravel()[0])


def timeit(fn, n=50):
    fn()  # warm (compiled already by caller)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    fetch(out)
    return (time.time() - t0) / n


def main():
    from opendog_tpu.utils import compile_cache
    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from opendog_tpu.assets import load_opendog
    from opendog_tpu.physics import dynamics, make_state
    from opendog_tpu.physics import terrain as terrain_lib
    from opendog_tpu.solvers import MPPIConfig, costs, make_mpc, mppi

    m = load_opendog("terrain")
    terr = terrain_lib.generate_terrain(jax.random.PRNGKey(5), m)
    home_j = np.asarray(m.key_qpos[0])[7:]
    cost = costs.standing_cost(m, 0.0694 + 0.151, home_j)
    cfg = MPPIConfig(horizon=25, num_samples=256, n_substeps=2,
                     rollout_dt=0.01, noise_sigma=0.08, engine="pallas")

    s0 = make_state(m, "home")
    s0 = s0.replace(qpos=s0.qpos.at[2].add(0.151))

    out = {}

    # ---- full composed tick (the 2c measurement, 1 tick at a time) ----
    init, tick, run = make_mpc(m, cost, cfg, plant_substeps=10,
                               terrain=terr)
    carry = init(jax.random.PRNGKey(0), s0)
    jtick = jax.jit(tick)
    carry, _ = jtick(carry); fetch(carry.plant.qpos)
    t = timeit(lambda: jtick(carry)[0].plant.qpos)
    out["full_tick_ms"] = round(t * 1e3, 3)

    # ---- solve only (no plant advance) ----
    solve = mppi.make_solver(m, cost, cfg, terrain=terr)
    ms = mppi.init_state(m, cfg)
    key = jax.random.PRNGKey(1)
    jsolve = jax.jit(lambda st, ms: solve(st, ms, key))
    ctrl, ms2, _ = jsolve(s0, ms); fetch(ctrl)
    t = timeit(lambda: jsolve(s0, ms)[0])
    out["solve_only_ms"] = round(t * 1e3, 3)

    # ---- plant only (10 exact-bilinear XLA substeps) ----
    hold = jnp.asarray(m.key_ctrl[0])
    jplant = jax.jit(lambda st: dynamics.step(m, st, hold, terr,
                                              n_substeps=10)[0])
    s1 = jplant(s0); fetch(s1.qpos)
    t = timeit(lambda: jplant(s0).qpos)
    out["plant_only_ms"] = round(t * 1e3, 3)

    # ---- plant on the FLAT pallas kernel (what config 2's plant costs) ----
    from opendog_tpu.ops.pallas_step import build_pallas_substep
    mf = load_opendog("flat")
    psub = build_pallas_substep(mf, float(mf.timestep), k_tile=1,
                                n_substeps=10)
    jp = jax.jit(lambda qp, qv, c: psub(qp, qv, c))
    qp0, qv0 = s0.qpos[:, None], s0.qvel[:, None]
    r = jp(qp0, qv0, hold[:, None]); fetch(r[0])
    t = timeit(lambda: jp(qp0, qv0, hold[:, None])[0])
    out["plant_pallas_flat_ms"] = round(t * 1e3, 3)

    # ---- local-plane computation alone ----
    def plane(st):
        h, n = dynamics._terrain_height_normal(m, terr, st.qpos[None, :2])
        return h, n
    jplane = jax.jit(plane)
    r = jplane(s0); fetch(r[0])
    t = timeit(lambda: jplane(s0)[0])
    out["plane_only_ms"] = round(t * 1e3, 3)

    # ---- flat solve with the same robot/cost (plane-lane overhead) ----
    solve_f = mppi.make_solver(mf, cost, cfg)
    jsolve_f = jax.jit(lambda st, ms: solve_f(st, ms, key))
    ctrl, _, _ = jsolve_f(s0, ms); fetch(ctrl)
    t = timeit(lambda: jsolve_f(s0, ms)[0])
    out["flat_solve_only_ms"] = round(t * 1e3, 3)

    out["derived"] = {
        "solves_per_s_full_tick": round(1e3 / out["full_tick_ms"], 1),
        "plant_share_of_tick": round(
            out["plant_only_ms"] / out["full_tick_ms"], 3),
        "plane_lane_overhead_ms": round(
            out["solve_only_ms"] - out["flat_solve_only_ms"], 3),
        "plant_xla_vs_pallas_ratio": round(
            out["plant_only_ms"] / max(out["plant_pallas_flat_ms"], 1e-9), 1),
    }
    out["_provenance"] = dict(
        recorded_at=time.strftime("%Y-%m-%dT%H:%M:%S"),
        device=str(jax.devices()[0]),
    )
    os.makedirs("runs/terrain_profile", exist_ok=True)
    with open("runs/terrain_profile/metrics.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

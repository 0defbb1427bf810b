#!/usr/bin/env python
"""Closed-form calibration of the command gait's speed->amplitude and
turn-response laws, measured OPEN LOOP on the SAME plant engine the
distilled student is evaluated on (VERDICT r4 item 1).

Round 4 calibrated the OpenDOG gait on the op-graph plant and then
trained/evaluated on the fused Pallas plant — the two engines realize
different speeds for the same stride (the documented engine-mismatch rule
of solvers/mpc.py:46-53 applies to calibration too), which is exactly the
uniform ~52% command attenuation `runs/distill_cmd_opendog` recorded.

This script rolls `costs.trot_gait_ref_cmd` open loop (one pallas lane
per probe command), measures realized heading-frame speed per commanded
stride scale and the yaw response per turn command, and emits both the
raw curves and a fitted inverse law (piecewise-linear knots for
`TrotCostParams.amp_knots`) ready to paste into
`rl/distill_zoo.cmd_distill_setup`.

Mirrors the quantity the reference randomizes per reset
(environments/WalkEnvironment.py:138-151 desired velocity) — this is the
map from that command to the gait amplitude that realizes it.

Usage: python scripts/calibrate_cmd_gait.py --robot opendog
Artifacts: runs/cmd_calibration/<robot>.json
"""
import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="opendog", choices=["go1", "opendog"])
    ap.add_argument("--ticks", type=int, default=400,
                    help="rollout length per probe (50 Hz ticks)")
    ap.add_argument("--settle", type=int, default=100,
                    help="transient ticks excluded from the speed window")
    ap.add_argument("--out", default="runs/cmd_calibration")
    args = ap.parse_args()

    from opendog_tpu.utils import compile_cache
    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from opendog_tpu.physics import State, make_state, spatial
    from opendog_tpu.physics import dynamics as _dyn
    from opendog_tpu.rl.distill_zoo import cmd_distill_setup
    from opendog_tpu.solvers import costs

    engine = "pallas" if jax.default_backend() != "cpu" else "xla"
    setup = cmd_distill_setup(args.robot, engine=engine)
    m, u_ref, z_band = setup.model, setup.u_ref, setup.z_band
    pc = costs.TrotCostParams(**{
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in setup.recipe["cost_params"].items()})
    v_nom = float(np.hypot(*pc.desired_vel_xy))

    # ---- probe grid ------------------------------------------------------
    # Speed probes are chosen so the CURRENT law's implied stride scale
    # sweeps [0.18, 1.5] — the raw scale->speed curve falls out regardless
    # of which law is active.  Turn probes cover stand + trotting turns.
    if args.robot == "opendog":
        speed_cmds = [round(s * v_nom, 4)
                      for s in (0.18, 0.3, 0.45, 0.6, 0.75, 0.9, 1.05,
                                1.2, 1.35, 1.5)]
        turn_cmds = [(0.0, 0.2), (0.0, 0.4), (0.0, -0.4), (0.0, 0.8),
                     (0.15, 0.3), (0.15, -0.3), (0.2, 0.2)]
    else:
        speed_cmds = [round(0.1 + 0.08 * i, 4) for i in range(10)]
        turn_cmds = [(0.0, 0.25), (0.0, 0.5), (0.0, -0.5), (0.0, 1.0),
                     (0.3, 0.4), (0.3, -0.4), (0.5, 0.2)]
    cmds_list = ([[v, 0.0, 0.0] for v in speed_cmds]
                 + [[v, 0.0, y] for v, y in turn_cmds])
    S = len(cmds_list)
    cmds = jnp.asarray(np.asarray(cmds_list, np.float32))

    side = costs._side_signs(args.robot)
    implied_scale = [float(costs._cmd_stride_scales(
        pc, v_nom, jnp.zeros(4), jnp.asarray(c, jnp.float32), None)[0])
        for c in cmds_list]

    # ---- plant (same construction as rl/distill.py) ----------------------
    lo, hi = np.asarray(m.actuator_ctrlrange).T
    lo, hi = jnp.asarray(lo), jnp.asarray(hi)
    plant_substeps = 10
    dt_tick = plant_substeps * float(m.timestep)
    if engine == "pallas":
        from opendog_tpu.ops.pallas_step import build_pallas_substep
        _sub = build_pallas_substep(m, float(m.timestep), k_tile=S,
                                    n_substeps=plant_substeps)

        def plant_step(plants, ctrl):
            qp, qv = _sub(plants.qpos.T, plants.qvel.T, ctrl.T)
            return State(qpos=qp.T, qvel=qv.T,
                         time=plants.time + dt_tick)
    else:
        def plant_step(plants, ctrl):
            plants2, _ = jax.vmap(
                lambda s, c: _dyn.step(m, s, c, None,
                                       n_substeps=plant_substeps)
            )(plants, ctrl)
            return plants2

    # settled home stand, exactly as scripts/distill_cmd.py builds it
    s0 = make_state(m, "home")
    hold = jnp.asarray(np.clip(np.asarray(m.key_ctrl[0], np.float32),
                               np.asarray(m.actuator_ctrlrange)[:, 0],
                               np.asarray(m.actuator_ctrlrange)[:, 1]))
    s0, _ = jax.jit(lambda st: _dyn.step(m, st, hold, None,
                                         n_substeps=150))(s0)
    plants = State(qpos=jnp.tile(s0.qpos[None], (S, 1)),
                   qvel=jnp.zeros((S, m.nv)), time=jnp.zeros(S))

    def tick(plants, _):
        ctrl = jax.vmap(lambda t, c: jnp.clip(u_ref(t, c), lo, hi))(
            plants.time, cmds)
        plants = plant_step(plants, ctrl)
        yaw = jax.vmap(
            lambda q: spatial.euler_from_quat(q[3:7])[2])(plants.qpos)
        return plants, (plants.qpos[:, :3], yaw)

    print(f"[calib] engine={engine} robot={args.robot} probes={S} "
          f"ticks={args.ticks}", flush=True)
    t0 = time.time()
    run = jax.jit(lambda p: jax.lax.scan(tick, p, None, length=args.ticks))
    _, (xyz, yaws) = run(plants)
    xyz = np.asarray(xyz)      # (T, S, 3)
    yaws = np.asarray(yaws)    # (T, S)
    print(f"[calib] rollout done in {time.time() - t0:.0f}s", flush=True)

    from opendog_tpu.utils.cmd_tracking import heading_frame_vx

    W = args.settle
    per = []
    for i, c in enumerate(cmds_list):
        z = xyz[:, i, 2]
        upright = bool(((z > z_band[0]) & (z < z_band[1])).all())
        vx = float(heading_frame_vx(xyz[W:, i, :2], c[2], dt_tick))
        rec = dict(cmd=[round(v, 3) for v in c],
                   scale=round(implied_scale[i], 3),
                   realized_vx=round(vx, 4),
                   yaw_end=round(float(yaws[-1, i]), 3),
                   upright=upright,
                   z_min=round(float(z.min()), 3))
        if c[2] != 0.0:
            # yaw trajectory samples: convergence shape, not just endpoint
            idx = np.linspace(0, args.ticks - 1, 9).astype(int)
            rec["yaw_traj"] = [round(float(yaws[k, i]), 3) for k in idx]
            rec["t_samples_s"] = [round(float(k * dt_tick), 2) for k in idx]
        per.append(rec)
        print(json.dumps(rec), flush=True)

    # ---- fit: inverse law knots -----------------------------------------
    # Monotone envelope of the measured (scale, vx) curve, inverted into
    # piecewise-linear (v -> scale) knots.  Only upright speed probes
    # participate; a non-monotone tail (over-striding slows the robot)
    # is cut at the argmax.
    sp = [(r["scale"], r["realized_vx"]) for r in per
          if r["cmd"][2] == 0.0 and r["upright"]]
    sp.sort()
    fit = {}
    if len(sp) >= 3:
        scales = np.array([s for s, _ in sp])
        vels = np.array([v for _, v in sp])
        k_max = int(np.argmax(vels))
        s_mono, v_mono = scales[:k_max + 1], vels[:k_max + 1]
        # enforce strictly increasing v for invertibility
        keep = [0]
        for j in range(1, len(v_mono)):
            if v_mono[j] > v_mono[keep[-1]] + 1e-4:
                keep.append(j)
        s_mono, v_mono = s_mono[keep], v_mono[keep]
        A = np.stack([s_mono, np.ones_like(s_mono)], 1)
        (slope, icept), *_ = np.linalg.lstsq(A, v_mono, rcond=None)
        fit = dict(
            v_max=round(float(vels.max()), 4),
            scale_at_v_max=round(float(scales[k_max]), 3),
            linear_v_per_scale=round(float(slope), 4),
            linear_intercept=round(float(icept), 4),
            # inverse-law knots (v -> scale), origin-anchored for the
            # stand gate; paste into TrotCostParams.amp_knots
            amp_knots=[[0.0, 0.0]] + [[round(float(v), 4),
                                       round(float(s), 3)]
                                      for v, s in zip(v_mono, s_mono)],
        )

    os.makedirs(args.out, exist_ok=True)
    res = dict(robot=args.robot, engine=engine, ticks=args.ticks,
               dt_tick=dt_tick, settle_ticks=W,
               cost_params=setup.recipe["cost_params"],
               per_probe=per, fit=fit,
               wall_s=round(time.time() - t0, 1))
    path = os.path.join(args.out, f"{args.robot}.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(dict(robot=args.robot, engine=engine, fit=fit,
                          out=path)), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Command-switching soak of the committed command-conditioned student
(runs/distill_cmd): ONE network drives the go1 plant through a schedule of
velocity/heading commands — walk, stand, slow trot, turn, fast trot — for
minutes of sim time, entirely on-device.

This is the deployment-shaped proof for BASELINE config 5: the reference's
on-robot loop switches gaits by swapping scripted tables
(Code/examples/udp_walk.py); here one policy serves every mode and the
transition, conditioned on the command vector.

Writes <out>/soak.json with per-segment tracking + whole-run health.
"""
import argparse
import json
import os
import time

import numpy as np

# absolute (vx, vy, yaw_target) per 10 s segment — covers every curriculum
# mode plus transitions (stand -> fast, turn -> counter-turn) and, in the
# second half, probes BETWEEN the curriculum mode centers (modes are
# 0/0.25/0.3/0.5/0.6 m/s and yaw 0/0.2/±0.4/0.5, each jittered ±0.05 in
# training, so 0.35/0.45 m/s and yaw ±0.25 sit at or beyond the sampled
# envelope — a command-space density test, not pure extrapolation)
SCHEDULE_BY_ROBOT = {}
SCHEDULE_BY_ROBOT["go1"] = [
    [0.5, 0.0, 0.0],
    [0.0, 0.0, 0.0],
    [0.25, 0.0, 0.0],
    [0.3, 0.0, 0.4],
    [0.6, 0.0, 0.4],    # keep heading while speeding up
    [0.0, 0.0, 0.0],    # stop from speed
    [0.0, 0.0, 0.5],    # turn in place
    [0.3, 0.0, -0.4],   # counter-turn while trotting
    [0.5, 0.0, -0.4],
    [0.25, 0.0, 0.0],   # slow home stretch
    [0.0, 0.0, 0.0],
    [0.5, 0.0, 0.0],
    # ---- interpolation probes (off the training grid) ----
    [0.35, 0.0, 0.0],
    [0.45, 0.0, 0.0],
    [0.35, 0.0, 0.25],
    [0.45, 0.0, -0.25],
    [0.0, 0.0, 0.25],   # gentle turn in place
    [0.55, 0.0, 0.0],
    [0.0, 0.0, 0.0],
]
# namesake-robot schedule: the same shape scaled to the OpenDOG's measured
# capability envelope (calibrated ceiling ~0.204 m/s; grid modes
# 0/0.1/0.17/0.22 m/s, yaw 0/0.2/±0.3/0.4 — the probes 0.13/0.19 m/s and
# yaw ±0.25 sit BETWEEN curriculum modes)
SCHEDULE_BY_ROBOT["opendog"] = [
    [0.17, 0.0, 0.0],
    [0.0, 0.0, 0.0],
    [0.1, 0.0, 0.0],
    [0.15, 0.0, 0.3],
    [0.2, 0.0, 0.3],
    [0.0, 0.0, 0.0],
    [0.0, 0.0, 0.4],
    [0.15, 0.0, -0.3],
    [0.2, 0.0, -0.3],
    [0.1, 0.0, 0.0],
    [0.0, 0.0, 0.0],
    [0.17, 0.0, 0.0],
    # ---- interpolation probes (off the training grid) ----
    [0.13, 0.0, 0.0],
    [0.19, 0.0, 0.0],
    [0.13, 0.0, 0.25],
    [0.19, 0.0, -0.25],
    [0.0, 0.0, 0.25],
    [0.21, 0.0, 0.0],
    [0.0, 0.0, 0.0],
]
SCHEDULE = SCHEDULE_BY_ROBOT["go1"]  # import-compat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--student", default="runs/distill_cmd/student.msgpack")
    ap.add_argument("--out", default="runs/distill_cmd")
    ap.add_argument("--robot", default="go1", choices=["go1", "opendog"])
    ap.add_argument("--segment_ticks", type=int, default=500)  # 10 s
    ap.add_argument("--payload_kg", type=float, default=0.0,
                    help="> 0 soaks with an UNOBSERVED trunk payload on "
                         "the plant (kernel payload lanes; TPU only) — "
                         "pair with the payload-randomized student "
                         "(runs/distill_cmd_payload)")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from opendog_tpu.physics import State, make_state, spatial
    from opendog_tpu.physics import dynamics as _dyn
    from opendog_tpu.rl.distill_zoo import cmd_distill_setup, load_student

    engine = "pallas" if jax.default_backend() != "cpu" else "xla"
    if args.smoke:
        args.segment_ticks = 5
    setup = cmd_distill_setup(args.robot, engine=engine)
    schedule = SCHEDULE_BY_ROBOT[args.robot]
    m = setup.model
    policy = load_student(args.student, setup, command_dim=3)
    z_lo, z_hi = setup.z_band

    seg = args.segment_ticks
    cmds_np = np.repeat(np.asarray(schedule, np.float32), seg, axis=0)
    T = cmds_np.shape[0]
    cmds = jnp.asarray(cmds_np)

    with_payload = args.payload_kg > 0.0
    if with_payload:
        assert engine == "pallas", \
            "--payload_kg rides the fused kernel's payload lanes (TPU)"
    if engine == "pallas":
        from opendog_tpu.ops.pallas_step import build_pallas_substep

        psub = build_pallas_substep(m, float(m.timestep), k_tile=1,
                                    n_substeps=10,
                                    with_payload=with_payload)
        pl_row = jnp.full((1, 1), args.payload_kg, jnp.float32)

        def plant_step(st, u):
            if with_payload:
                qp, qv = psub(st.qpos[:, None], st.qvel[:, None],
                              u[:, None], None, pl_row)
            else:
                qp, qv = psub(st.qpos[:, None], st.qvel[:, None],
                              u[:, None])
            return State(qpos=qp[:, 0], qvel=qv[:, 0],
                         time=st.time + 10 * float(m.timestep))
    else:

        def plant_step(st, u):
            st2, _ = _dyn.step(m, st, u, None, n_substeps=10)
            return st2

    home_ctrl = jnp.asarray(np.clip(
        np.asarray(m.key_ctrl[0], np.float32),
        np.asarray(m.actuator_ctrlrange)[:, 0],
        np.asarray(m.actuator_ctrlrange)[:, 1]))

    def run(st):
        def tick(carry, cmd):
            st, prev = carry
            u = policy(st.qpos, st.qvel, st.time, prev, cmd)
            st = plant_step(st, u)
            return (st, u), (st.qpos[:3], st.qpos[3:7])
        (st, _), (xyz, quat) = jax.lax.scan(tick, (st, home_ctrl), cmds)
        return st, xyz, quat

    s0 = make_state(m, "home")
    s0, _ = jax.jit(lambda s: _dyn.step(m, s, home_ctrl, None,
                                        n_substeps=150))(s0)
    s0 = State(qpos=s0.qpos, qvel=s0.qvel * 0.0, time=jnp.zeros(()))

    t0 = time.time()
    stf, xyz, quat = jax.jit(run)(s0)
    xyz = np.asarray(xyz)          # (T, 3)
    quat = np.asarray(quat)        # (T, 4)
    wall = time.time() - t0

    import jax.numpy as _j
    yaws = np.asarray(jax.vmap(
        lambda q: spatial.euler_from_quat(q)[2])(_j.asarray(quat)))
    zs = xyz[:, 2]
    from opendog_tpu.utils.cmd_tracking import segment_record

    segs = []
    for i, c in enumerate(schedule):
        a, b = i * seg, (i + 1) * seg
        rec = segment_record(xyz[a:b, :2], yaws[b - 1], c)
        rec["z_min"] = round(float(zs[a:b].min()), 3)
        segs.append(rec)
    # a segment tracks only if BOTH the speed and the heading are held —
    # a commanded stand with residual creep (vx_err >= 0.15) must FAIL
    thr_v = 0.15 if args.robot == "go1" else 0.15 * 0.28 / 0.5
    tracked = sum(1 for s in segs
                  if s["vx_err"] < thr_v and s["yaw_err"] < 0.25)
    res = dict(
        ticks=T,
        sim_minutes=round(T * 0.02 / 60.0, 2),
        segments=segs,
        segments_tracked=tracked,
        segments_total=len(segs),
        upright_all=bool((zs > z_lo).all() and (zs < z_hi).all()),
        all_finite=bool(np.isfinite(xyz).all()),
        final_xy=[round(float(v), 3) for v in xyz[-1, :2]],
        engine=engine,
        payload_kg=float(args.payload_kg),
        student=args.student,
        wall_s=round(wall, 1),
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "soak.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: v for k, v in res.items() if k != "segments"}),
          flush=True)
    for s in segs:
        print(json.dumps(s), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""MPC jump-onto-cube — the capability the reference's RL jump env never
achieved (its reward is zero until the robot is already airborne near the
cube, and the reference ships no trained jump artifacts).

A time-phased MPPI cost drives the go1 through crouch -> launch -> land
toward the jump_scene cube (0.8 m square platform, top at z=0.18, centred
at x=1): rollouts use the op-graph engine (sphere-vs-box contact with the
platform, matmul precision 'highest') so the planner sees the cube.

Result (defaults, runs/jump_mpc/metrics.json): the go1 crouches,
leaps with a real airborne phase (16 flight ticks, peak trunk z 0.419),
and LANDS ON THE PLATFORM (final x 0.822, z 0.332, upright) — under the
reference's own actuator spec (kp=25 position servos), whose ballistic
envelope makes this tight (takeoff vz ~2 m/s vs the ~2.3 ideal).  The
reference's RL jump env never produced any jump: its reward is zero
until the robot is already airborne near the cube, and no trained jump
artifacts ship.

Writes runs/jump_mpc/{metrics.json, jump.gif}.
"""
import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=90)
    ap.add_argument("--out", default="runs/jump_mpc")
    ap.add_argument("--gif", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config for CPU CI: exercises the full "
                         "pipeline, proves nothing about performance")
    # phase schedule [s] and launch velocity target
    ap.add_argument("--t_crouch", type=float, default=0.35)
    ap.add_argument("--t_launch", type=float, default=0.75)
    ap.add_argument("--vx", type=float, default=2.2)
    ap.add_argument("--vz", type=float, default=3.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from opendog_tpu.assets import load_go1
    from opendog_tpu.physics import dynamics, make_state, spatial
    from opendog_tpu.solvers import MPPIConfig, mppi

    m = load_go1("jump")
    home_j = np.asarray(m.key_qpos[0])[7:]
    cube_top = float(m.wbox_pos[0, 2] + m.wbox_size[0, 2])  # 0.18
    cube_x = float(m.wbox_pos[0, 0])
    land_z = cube_top + 0.27  # trunk height standing on the platform

    def step_cost(st, ctrl, prev_ctrl):
        qpos, qvel, t = st.qpos, st.qvel, st.time
        roll, pitch, yaw = spatial.euler_from_quat(qpos[3:7])
        up = jnp.square(roll) + jnp.square(pitch) + 0.3 * jnp.square(yaw)
        joints_home = jnp.sum(jnp.square(qpos[7:] - jnp.asarray(home_j)))
        rate = jnp.sum(jnp.square(ctrl - prev_ctrl))

        # crouch: compress to z ~ 0.19 above the start point
        c_crouch = (60.0 * jnp.square(qpos[2] - 0.16)
                    + 10.0 * jnp.square(qpos[0] - 0.25)
                    + 1.0 * joints_home)
        # launch: track the ballistic takeoff velocity
        c_launch = (8.0 * jnp.square(qvel[0] - args.vx)
                    + 10.0 * jnp.square(qvel[2] - args.vz)
                    + 4.0 * jnp.square(qvel[1]))
        # land: arrive on the NEAR half of the platform, upright, calm
        land_x = cube_x - 0.25
        c_land = (40.0 * jnp.square(qpos[0] - land_x)
                  + 60.0 * jnp.square(qpos[2] - land_z)
                  + 10.0 * jnp.square(qpos[1])
                  + 1.0 * jnp.sum(jnp.square(qvel[:6]))
                  + 1.0 * joints_home)
        phase_cost = jnp.where(
            t < args.t_crouch, c_crouch,
            jnp.where(t < args.t_launch, c_launch, c_land))
        return phase_cost + 20.0 * up + 0.2 * rate

    if args.smoke:
        args.ticks = 3
        cfg = MPPIConfig(horizon=5, num_samples=8, n_substeps=1,
                         rollout_dt=0.01, engine="xla")
    else:
        cfg = MPPIConfig(horizon=50, num_samples=512, n_substeps=2,
                         rollout_dt=0.01, noise_sigma=0.28,
                         temperature=0.25, smooth_alpha=0.5, engine="xla")
    solve = mppi.make_solver(m, step_cost, cfg)

    def run(st, ms, key, n):
        def tick(carry, _):
            st, ms, key = carry
            key, k = jax.random.split(key)
            with jax.default_matmul_precision("highest"):
                ctrl, ms, _ = solve(st, ms, k)
                st, info = dynamics.step(m, st, ctrl, None, n_substeps=10)
            fw, fb, ic = dynamics.foot_contact_summary(m, info.contact)
            return (st, ms, key), (st.qpos, ic.any())
        (st, ms, key), (qps, any_contact) = jax.lax.scan(
            tick, (st, ms, key), None, length=n)
        return st, qps, any_contact

    jrun = jax.jit(run, static_argnums=3)
    s0 = make_state(m, "home")
    # start 0.35 m from the platform edge (the platform spans x in
    # [0.6, 1.4]); the crouch cost's x-anchor follows the start
    s0 = s0.replace(qpos=s0.qpos.at[0].set(0.25))
    ms = mppi.init_state(m, cfg)
    t0 = time.time()
    stf, qps, contact = jrun(s0, ms, jax.random.PRNGKey(0), args.ticks)
    qps = np.asarray(qps)
    contact = np.asarray(contact)
    wall = time.time() - t0

    z = qps[:, 2]
    x = qps[:, 0]
    flight_ticks = int((~contact).sum())
    longest_flight = 0
    cur = 0
    for c in ~contact:
        cur = cur + 1 if c else 0
        longest_flight = max(longest_flight, cur)
    final = qps[-1]
    from opendog_tpu.physics import spatial as sp
    r, p, _ = np.asarray(sp.euler_from_quat(np.asarray(
        final[3:7], np.float32)))
    on_cube = (abs(final[0] - cube_x) < float(m.wbox_size[0, 0])
               and abs(final[1]) < float(m.wbox_size[0, 1])
               and final[2] > cube_top + 0.12)
    res = dict(
        ticks=args.ticks, wall_s=round(wall, 1),
        peak_z=round(float(z.max()), 3),
        final_x=round(float(final[0]), 3),
        final_z=round(float(final[2]), 3),
        roll=round(float(r), 3), pitch=round(float(p), 3),
        flight_ticks_total=flight_ticks,
        longest_flight_ticks=longest_flight,
        landed_on_cube=bool(on_cube),
        upright=bool(abs(r) < 0.5 and abs(p) < 0.5),
        all_finite=bool(np.isfinite(qps).all()),
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res), flush=True)

    if args.gif:
        import jax.numpy as jnp

        from opendog_tpu.physics import State
        from opendog_tpu.utils.render import record_rollout

        states = State(qpos=jnp.asarray(qps[::2]),
                       qvel=jnp.zeros((qps[::2].shape[0], m.nv)),
                       time=jnp.zeros(qps[::2].shape[0]))
        record_rollout(m, states, os.path.join(args.out, "jump.gif"),
                       fps=12)
        print("wrote jump.gif", flush=True)


if __name__ == "__main__":
    main()

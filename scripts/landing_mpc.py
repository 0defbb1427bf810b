#!/usr/bin/env python
"""MPC landing — the LandingEnvironment task solved by the solver stack.

The go1 drops from the ``descent`` keyframe (trunk z=0.6, legs tucked)
onto the landing_scene platform (0.8 m square, top z=0.4) and the MPPI
controller absorbs the impact and settles upright: minimize base twist,
track the standing height on the platform, keep joints near home.
Rollouts use the op-graph engine (sphere-vs-box platform contact).

Writes runs/landing_mpc/{metrics.json, landing.gif}.
"""
import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=75)  # 1.5 s
    ap.add_argument("--out", default="runs/landing_mpc")
    ap.add_argument("--gif", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config for CPU CI: exercises the full "
                         "pipeline, proves nothing about performance")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from opendog_tpu.assets import load_go1
    from opendog_tpu.physics import dynamics, make_state, spatial
    from opendog_tpu.solvers import MPPIConfig, mppi

    m = load_go1("landing")
    home_j = np.asarray(m.key_qpos[0])[7:]
    top = float(m.wbox_pos[0, 2] + m.wbox_size[0, 2])   # 0.4
    stand_z = top + 0.27

    def step_cost(st, ctrl, prev_ctrl):
        qpos, qvel = st.qpos, st.qvel
        roll, pitch, yaw = spatial.euler_from_quat(qpos[3:7])
        return (
            30.0 * (jnp.square(roll) + jnp.square(pitch))
            + 5.0 * jnp.square(yaw)
            + 40.0 * jnp.square(qpos[2] - stand_z)
            + 10.0 * jnp.sum(jnp.square(qpos[:2]))
            + 4.0 * jnp.sum(jnp.square(qvel[:6]))     # soft touchdown
            + 1.5 * jnp.sum(jnp.square(qpos[7:] - jnp.asarray(home_j)))
            + 0.3 * jnp.sum(jnp.square(ctrl - prev_ctrl))
        )

    if args.smoke:
        args.ticks = 3
        cfg = MPPIConfig(horizon=5, num_samples=8, n_substeps=1,
                         rollout_dt=0.01, engine="xla")
    else:
        cfg = MPPIConfig(horizon=30, num_samples=256, n_substeps=2,
                         rollout_dt=0.01, noise_sigma=0.08,
                         temperature=0.2, engine="xla")
    solve = mppi.make_solver(m, step_cost, cfg)

    def run(st, ms, key, n):
        def tick(carry, _):
            st, ms, key = carry
            key, k = jax.random.split(key)
            with jax.default_matmul_precision("highest"):
                ctrl, ms, _ = solve(st, ms, k)
                st, info = dynamics.step(m, st, ctrl, None, n_substeps=10)
            fw, fb, ic = dynamics.foot_contact_summary(m, info.contact)
            return (st, ms, key), (st.qpos, st.qvel[:6],
                                   jnp.abs(fw[:, 2]).max())
        (st, ms, key), (qps, base_twist, fmax) = jax.lax.scan(
            tick, (st, ms, key), None, length=n)
        return st, qps, base_twist, fmax

    def hold(st, n):
        """Post-landing hand-off: plain PD stand-hold at the home pose
        (the deployment pattern: MPC absorbs the impact, the firmware's
        position servos hold the stance)."""
        hc = jnp.asarray(m.key_ctrl[0])

        def tick(st, _):
            with jax.default_matmul_precision("highest"):
                st, _ = dynamics.step(m, st, hc, None, n_substeps=10)
            return st, (st.qpos, st.qvel[:6])
        return jax.lax.scan(tick, st, None, length=n)

    jrun = jax.jit(run, static_argnums=3)
    jhold = jax.jit(hold, static_argnums=1)
    s0 = make_state(m, "descent")
    ms = mppi.init_state(m, cfg, key_name="descent")
    t0 = time.time()
    stf, qps, tw, fmax = jrun(s0, ms, jax.random.PRNGKey(0), args.ticks)
    stf, (qps2, tw2) = jhold(stf, 3 if args.smoke else 50)
    qps = np.concatenate([np.asarray(qps), np.asarray(qps2)])
    tw = np.concatenate([np.asarray(tw), np.asarray(tw2)])
    fmax = np.asarray(fmax)
    wall = time.time() - t0

    final = qps[-1]
    from opendog_tpu.physics import spatial as sp
    r, p, _ = np.asarray(sp.euler_from_quat(np.asarray(final[3:7],
                                                       np.float32)))
    settled_twist = float(np.abs(tw[-10:]).max())
    res = dict(
        ticks=args.ticks, wall_s=round(wall, 1),
        min_trunk_z=round(float(qps[:, 2].min()), 3),
        final_z=round(float(final[2]), 3),
        on_platform=bool(abs(final[0]) < 0.4 and abs(final[1]) < 0.4
                         and final[2] > top + 0.1),
        upright=bool(abs(r) < 0.3 and abs(p) < 0.3),
        peak_contact_force_n=round(float(fmax.max()), 1),
        settled_base_twist=round(settled_twist, 4),
        settled=bool(settled_twist < 0.5),
        all_finite=bool(np.isfinite(qps).all()),
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res), flush=True)

    if args.gif:
        from opendog_tpu.physics import State
        from opendog_tpu.utils.render import record_rollout

        states = State(qpos=jnp.asarray(qps[::2]),
                       qvel=jnp.zeros((qps[::2].shape[0], m.nv)),
                       time=jnp.zeros(qps[::2].shape[0]))
        record_rollout(m, states, os.path.join(args.out, "landing.gif"),
                       fps=12)
        print("wrote landing.gif", flush=True)


if __name__ == "__main__":
    main()

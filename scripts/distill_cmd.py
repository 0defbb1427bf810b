#!/usr/bin/env python
"""Command-conditioned MPC -> policy distillation with a velocity-command
CURRICULUM (BASELINE.json config 5; VERDICT r3 item 1).

One student learns the whole command family: each DAgger round samples a
per-scenario command (vx, vy, yaw_target) from a WIDENING curriculum
(nominal trot speed first, then the full range incl. 0 = stand and turning
headings); the MPPI expert plans for its scenario's command
(``mppi.make_solver(with_command=True)`` + ``costs.trot_cost_cmd``), and
the student observes the command.  Mirrors the reference's per-reset
randomized desired velocity (environments/WalkEnvironment.py:138-151) —
which its fixed-gait students never actually learned to track.

The decisive ingredient is the ANCHORED expert (``--anchor_w``): a free
receding-horizon MPPI expresses its corrections through warm-started plan
state that drifts in phase from the gait reference, so its labels
(expert - u_ref) carry ~gait-amplitude hidden-state dependence no
state-conditioned regressor can fit — v1-v4 of this script all collapsed
to a standing student that way, with balanced mode allocation, the beta
floor, and the quadrature lift timing each necessary but NOT sufficient.
Anchoring prices that drift (mppi.make_solver(u_ref_fn=, anchor_w=)), so
labels shrink to small state-predictable feedback.

Proof: a student-only rollout over a fixed command grid — the SAME network
must hold a stand (cmd 0), track multiple forward speeds, and turn to
commanded headings.  Artifacts: runs/distill_cmd/{student.msgpack,
metrics.json}.
"""
import argparse
import json
import os
import time

import numpy as np


# per-robot eval grid / curriculum, speeds scaled to each robot's nominal
# trot (go1 0.5 m/s; the 7 cm-tall opendog 0.28 m/s)
EVAL_CMDS_BY_ROBOT = {
    "go1": [
        [0.0, 0.0, 0.0],     # stand
        [0.25, 0.0, 0.0],    # slow trot
        [0.5, 0.0, 0.0],     # nominal trot
        [0.6, 0.0, 0.0],     # fast trot
        [0.3, 0.0, 0.4],     # trot + turn left
        [0.3, 0.0, -0.4],    # trot + turn right
        [0.0, 0.0, 0.5],     # turn in place
        [0.5, 0.0, 0.2],     # fast + slight turn
    ],
    # speeds span the MEASURED capability envelope of the opendog command
    # gait (open-loop ceiling ~0.21 m/s on this 7 cm robot; commanding
    # beyond it is untrackable by construction — the first training run
    # with a 0.28/0.34 grid measured the student topping out at 0.13)
    "opendog": [
        [0.0, 0.0, 0.0],
        [0.1, 0.0, 0.0],
        [0.17, 0.0, 0.0],
        [0.22, 0.0, 0.0],
        [0.15, 0.0, 0.3],
        [0.15, 0.0, -0.3],
        [0.0, 0.0, 0.4],
        [0.2, 0.0, 0.2],
    ],
}
EVAL_CMDS = EVAL_CMDS_BY_ROBOT["go1"]  # import-compat (distill_cmd_32k)


# curriculum grid in difficulty order: nominal trot first, then slower/
# faster speeds, stand, and turning modes.  DISCRETE modes (with small
# jitter) rather than a continuum: S x rounds scenario-episodes
# concentrate per command mode instead of spreading over a 3-D continuum
# (a continuum curriculum measured to regress toward a stand-still mean).
CURRICULUM_BY_ROBOT = {
    "go1": [
        (0.5, 0.0), (0.25, 0.0), (0.6, 0.0), (0.0, 0.0),
        (0.3, 0.4), (0.3, -0.4), (0.5, 0.2), (0.0, 0.5),
    ],
    "opendog": [
        (0.17, 0.0), (0.1, 0.0), (0.22, 0.0), (0.0, 0.0),
        (0.15, 0.3), (0.15, -0.3), (0.2, 0.2), (0.0, 0.4),
    ],
}
CURRICULUM = CURRICULUM_BY_ROBOT["go1"]


def sample_commands(rng, S, frac, max_modes=None, curriculum=None,
                    jitter=0.05):
    """Widening discrete curriculum with BALANCED mode allocation: round
    fraction ``frac`` unlocks a prefix of CURRICULUM; the S scenarios are
    split evenly across the unlocked modes (random draws measured to let
    later rounds dilute the walking modes — the multi-mode student then
    regresses to the stand attractor), plus jitter on the moving modes."""
    cur = CURRICULUM if curriculum is None else curriculum
    n_avail = 1 + int(round(frac * (len(cur) - 1)))
    if max_modes is not None:
        n_avail = min(n_avail, max_modes)
    modes = (np.arange(S) * n_avail) // S  # balanced, deterministic
    vx = np.array([cur[i][0] for i in modes])
    yaw = np.array([cur[i][1] for i in modes])
    moving = vx > 0.0
    vx = np.where(moving, vx + rng.uniform(-jitter, jitter, S), 0.0)
    yaw = yaw + np.where(moving, rng.uniform(-jitter, jitter, S), 0.0)
    return np.stack([vx, np.zeros(S), yaw], axis=1).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=40)
    ap.add_argument("--scenarios", type=int, default=8)
    ap.add_argument("--ticks", type=int, default=100)
    ap.add_argument("--eval_ticks", type=int, default=400)
    ap.add_argument("--out", default="runs/distill_cmd")
    ap.add_argument("--robot", default="go1",
                    choices=["go1", "opendog"])
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--max_modes", type=int, default=None,
                    help="clamp the curriculum to its first N modes "
                         "(bisection/debug)")
    ap.add_argument("--anchor_w", type=float, default=15.0,
                    help="expert anchor weight: prices the MPPI expert's "
                         "plan deviation from u_ref(t, cmd) so labels "
                         "stay small + state-predictable (0 = free "
                         "expert, the measured stand-collapse)")
    ap.add_argument("--payload_hi", type=float, default=0.0,
                    help="> 0 also randomizes an UNOBSERVED trunk payload "
                         "in [0, payload_hi] kg per scenario (the expert "
                         "plans with it, the student must be robust to "
                         "it) — unifies BASELINE config 5's command "
                         "curriculum with config 4's payload "
                         "randomization.  engine=pallas (TPU) only.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from opendog_tpu.physics import State, make_state, spatial
    from opendog_tpu.physics import dynamics as _dyn
    from opendog_tpu.rl.distill import DistillConfig, make_distiller
    from opendog_tpu.rl.distill_zoo import cmd_distill_setup
    from opendog_tpu.solvers import mppi as mppi_mod

    engine = "pallas" if jax.default_backend() != "cpu" else "xla"
    setup = cmd_distill_setup(args.robot, engine=engine)
    grid = EVAL_CMDS_BY_ROBOT[args.robot]
    curriculum = CURRICULUM_BY_ROBOT[args.robot]
    # per-robot tracking thresholds, scaled by nominal trot speed (the
    # VERDICT done-criterion numbers are go1's; opendog trots 0.28 m/s)
    v_scale = 1.0 if args.robot == "go1" else 0.28 / 0.5
    thr_vx, thr_stand, thr_yaw = 0.12 * v_scale, 0.07 * v_scale, 0.2
    jit_cmd = 0.05 * v_scale
    if args.smoke:
        from opendog_tpu.solvers import MPPIConfig

        args.rounds, args.ticks, args.eval_ticks = 1, 2, 3
        args.scenarios = min(args.scenarios, 2)
        setup = setup._replace(mppi_config=MPPIConfig(
            horizon=3, num_samples=8, n_substeps=1, rollout_dt=0.01,
            engine=engine))
    m, cost, u_ref, obs_fn, net = (setup.model, setup.cost, setup.u_ref,
                                   setup.obs_fn, setup.net)
    mcfg, z_band = setup.mppi_config, setup.z_band
    S = args.scenarios
    dcfg = DistillConfig(num_scenarios=S, rollout_ticks=args.ticks,
                         rounds=args.rounds, lr=1e-3, batch_size=512,
                         epochs_per_round=8, beta_decay=0.93)
    use_payload = args.payload_hi > 0.0
    if use_payload:
        assert engine == "pallas", \
            "--payload_hi rides the fused kernel's payload lanes (TPU)"
    init, round_fn, eval_fn, collect, train_on = make_distiller(
        m, cost, obs_fn, net, mppi_config=mcfg, config=dcfg,
        plant_substeps=10, action_ref_fn=u_ref, with_prev_ctrl=True,
        command_dim=3, anchor_w=args.anchor_w,
        payload_range=((0.0, args.payload_hi) if use_payload else None))
    setup = setup._replace(recipe=dict(
        setup.recipe, anchor_w=float(args.anchor_w),
        **(dict(payload_range=[0.0, float(args.payload_hi)])
           if use_payload else {})))

    s0 = make_state(m, "home")
    hold = jnp.asarray(np.clip(np.asarray(m.key_ctrl[0], np.float32),
                               np.asarray(m.actuator_ctrlrange)[:, 0],
                               np.asarray(m.actuator_ctrlrange)[:, 1]))
    s0, _ = jax.jit(lambda st: _dyn.step(m, st, hold, None,
                                         n_substeps=150))(s0)
    s0 = State(qpos=s0.qpos, qvel=s0.qvel * 0.0, time=jnp.zeros(()))
    kq = jax.random.split(jax.random.PRNGKey(7), S)

    def jitter(key, qpos, yaw_range=0.0):
        kj, kz, ky = jax.random.split(key, 3)
        qpos = qpos.at[7:].add(0.03 * jax.random.normal(kj, (m.nq - 7,)))
        qpos = qpos.at[2].add(0.01 * jax.random.normal(kz, ()))
        # initial-YAW randomization (training only): without it, every
        # heading mode spends nearly the whole episode mid-turn and the
        # student never sees the stop-and-hold regime (dyaw ~ 0 with the
        # u_ref still commanding a full differential stride) — the
        # measured turn-in-place OVERSHOOT (final_yaw 0.63-0.67 for
        # target 0.4, w_heading 15 and 22 alike).  Random start headings
        # make near-target and past-target states first-class training
        # data for every mode.  The EVAL keeps yaw-0 starts (same grid
        # contract as go1).
        a = yaw_range * jax.random.uniform(ky, (), minval=-1.0, maxval=1.0)
        qyaw = spatial.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), a)
        return qpos.at[3:7].set(spatial.quat_mul(qyaw, qpos[3:7]))

    qpos0 = jax.vmap(jitter, in_axes=(0, None))(kq, s0.qpos)
    plants0 = State(qpos=qpos0, qvel=jnp.zeros((S, m.nv)),
                    time=jnp.zeros(S))
    kq_t = jax.random.split(jax.random.PRNGKey(11), S)
    qpos0_t = jax.vmap(lambda k, q: jitter(k, q, yaw_range=0.6),
                       in_axes=(0, None))(kq_t, s0.qpos)
    plants_train = State(qpos=qpos0_t, qvel=jnp.zeros((S, m.nv)),
                         time=jnp.zeros(S))
    plants = plants_train
    dstate = init(jax.random.PRNGKey(0), s0)

    jcollect = jax.jit(collect)
    jtrain = jax.jit(train_on)
    TRAIN_N = 8192
    rng = np.random.default_rng(0)
    buf_obs, buf_lab = [], []
    t0 = time.time()
    loss = float("nan")
    for r in range(args.rounds):
        frac = r / max(1, args.rounds - 1)
        # beta floor keeps the expert driving >=20% of ticks forever: pure
        # student-driven late rounds fill the buffer with recovery labels
        # around non-walking states and swamp the gait data
        beta = max(0.2, dcfg.beta_decay ** r)
        cmds = jnp.asarray(sample_commands(rng, S, frac, args.max_modes,
                                           curriculum=curriculum,
                                           jitter=jit_cmd))
        payloads = (jnp.asarray(rng.uniform(0.0, args.payload_hi, S),
                                jnp.float32) if use_payload else None)
        mstates = jax.vmap(lambda _: mppi_mod.init_state(m, mcfg))(
            jnp.arange(S))
        plants, _, key, obs, labels = jcollect(
            dstate, plants, mstates, jnp.float32(beta), payloads, cmds)
        dstate = dstate.replace(key=key)
        buf_obs.append(np.asarray(obs)); buf_lab.append(np.asarray(labels))
        all_obs = np.concatenate(buf_obs); all_lab = np.concatenate(buf_lab)
        for _ in range(3):
            idx = rng.integers(0, all_obs.shape[0], TRAIN_N)
            ko = jax.random.PRNGKey(int(rng.integers(1 << 30)))
            dstate, loss = jtrain(dstate, jnp.asarray(all_obs[idx]),
                                  jnp.asarray(all_lab[idx]), ko)
        loss = float(loss)
        print(f"round {r}: loss {loss:.4f} beta {beta:.3f} frac {frac:.2f} "
              f"cmds vx={np.round(np.asarray(cmds)[:, 0], 2).tolist()} "
              f"buffer {all_obs.shape[0]} ({time.time() - t0:.0f}s)",
              flush=True)
        if (r + 1) % 4 == 0:
            # fresh start-yaw draws each reset: more heading-error
            # coverage than one fixed batch of initial yaws
            kq_t = jax.random.split(
                jax.random.PRNGKey(1000 + r), S)
            qpos0_t = jax.vmap(lambda k, q: jitter(k, q, yaw_range=0.6),
                               in_axes=(0, None))(kq_t, s0.qpos)
            plants = State(qpos=qpos0_t, qvel=jnp.zeros((S, m.nv)),
                           time=jnp.zeros(S))
    for _ in range(20):
        idx = rng.integers(0, all_obs.shape[0], TRAIN_N)
        ko = jax.random.PRNGKey(int(rng.integers(1 << 30)))
        dstate, loss = jtrain(dstate, jnp.asarray(all_obs[idx]),
                              jnp.asarray(all_lab[idx]), ko)
    loss = float(loss)
    print(f"final fit loss {loss:.4f}", flush=True)

    # save the student BEFORE the eval: hours of training must not be
    # lost to an eval-stage crash
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "student.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(dstate.params)))

    print("student-only eval over the command grid...", flush=True)
    # cycle the grid if S != len(EVAL_CMDS): eval_fn vmaps over exactly S
    # scenarios, so the command rows must match that width
    eval_cmds = jnp.asarray(np.asarray(
        [grid[i % len(grid)] for i in range(S)], np.float32))
    from opendog_tpu.utils.cmd_tracking import segment_record

    jeval = jax.jit(eval_fn, static_argnums=2)

    def eval_grid(payload):
        """Student-only rollout of the whole grid at one (unobserved)
        payload; heading-frame speed + wrapped yaw error via the shared
        helper so "tracked" measures the same geometry as the soak."""
        pl = (jnp.full((S,), payload, jnp.float32)
              if payload is not None else None)
        out = jeval(dstate, plants0, args.eval_ticks, pl, eval_cmds)
        qpos_traj = np.asarray(out["qpos_traj"])      # (T, S, nq)
        z = qpos_traj[:, :, 2]
        upright = ((z > z_band[0]) & (z < z_band[1])).all(axis=0)
        per = []
        # first occurrence of each grid row only (rows repeat if S > grid)
        for i, c in list(enumerate(np.asarray(eval_cmds)))[:len(grid)]:
            quat = qpos_traj[-1, i, 3:7]
            yaw = float(np.asarray(
                spatial.euler_from_quat(jnp.asarray(quat)))[2])
            rec = segment_record(qpos_traj[:, i, :2], yaw, c)
            rec["mean_vx"] = rec.pop("mean_vx_cmd_frame")  # artifact schema
            rec["final_yaw"] = rec.pop("yaw_end")
            rec["upright"] = bool(upright[i])
            if payload is not None:
                rec["payload_kg"] = round(float(payload), 2)
            per.append(rec)
            print(json.dumps(per[-1]), flush=True)
        speeds_tracked = sum(
            1 for p in per
            if p["upright"] and p["cmd"][2] == 0.0
            and p["vx_err"] < thr_vx)
        heading_ok = [p for p in per if p["cmd"][2] != 0.0
                      and p["upright"] and p["yaw_err"] < thr_yaw]
        return dict(
            per_command=per,
            action_rmse=float(out["action_rmse"]),
            speeds_tracked=speeds_tracked,
            headings_tracked=len(heading_ok),
            upright_all=bool(upright.all()),
            # VERDICT done-criterion: >= 3 speeds incl. stand + turns
            tracks_3_speeds_and_turns=bool(
                speeds_tracked >= 3
                and any(p["cmd"][0] == 0.0 and p["vx_err"] < thr_stand
                        and p["upright"] for p in per)
                and len(heading_ok) >= 2),
        )

    if use_payload:
        # the student never observes the payload: the grid must track at
        # EVERY load level
        levels = [0.0, args.payload_hi / 2, args.payload_hi]
        grids = {f"payload_{p:g}kg": eval_grid(p) for p in levels}
        res = dict(
            rounds=args.rounds,
            final_loss=loss,
            eval_ticks=args.eval_ticks,
            payload_levels=levels,
            **{k: v for k, v in grids.items()},
            tracks_grid_at_all_payloads=bool(
                all(g["tracks_3_speeds_and_turns"]
                    for g in grids.values())),
            upright_all=bool(all(g["upright_all"] for g in grids.values())),
            wall_s=round(time.time() - t0, 1),
            recipe=setup.recipe,
        )
    else:
        g = eval_grid(None)
        res = dict(
            rounds=args.rounds,
            final_loss=loss,
            action_rmse=g["action_rmse"],
            eval_ticks=args.eval_ticks,
            per_command=g["per_command"],
            speeds_tracked=g["speeds_tracked"],
            headings_tracked=g["headings_tracked"],
            upright_all=g["upright_all"],
            tracks_3_speeds_and_turns=g["tracks_3_speeds_and_turns"],
            wall_s=round(time.time() - t0, 1),
            recipe=setup.recipe,
        )
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: v for k, v in res.items() if k != "per_command"}),
          flush=True)


if __name__ == "__main__":
    main()

"""MPC → policy distillation (BASELINE.json config 5).

The reference deploys either trained policies or scripted gaits; the
driver's north star adds MPC-in-the-loop training: run the MPPI controller
as the expert over batched (optionally domain-randomized) scenarios and
regression-train a compact policy network on the visited (observation,
expert-action) pairs — DAgger-style, with the student progressively driving
the rollouts.  The distilled policy is deployable through the same
``walk.json`` / on-robot 12.5 Hz pipeline as the reference's RL policies.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..physics import State, dynamics
from ..solvers import mppi


class Distiller(NamedTuple):
    """Bundle returned by make_distiller.  ``init/round_fn/eval_fn`` is
    the simple per-round interface (trains on the latest round only);
    ``collect`` and ``train_on`` are the pieces for true DAgger dataset
    AGGREGATION across rounds (scripts/distill_walk.py): collect with the
    current policy, append to a host-side buffer, train on fixed-size
    resamples of the whole aggregate."""

    init: Callable
    round_fn: Callable
    eval_fn: Callable
    collect: Callable
    train_on: Callable


class DistillConfig(NamedTuple):
    num_scenarios: int = 8       # parallel MPC experts
    rollout_ticks: int = 50      # expert ticks per round
    rounds: int = 10
    lr: float = 3e-4
    batch_size: int = 256
    epochs_per_round: int = 4
    beta_decay: float = 0.7      # DAgger mixing: P(expert drives)


@struct.dataclass
class DistillState:
    params: dict
    opt_state: tuple
    key: jax.Array


def make_distiller(
    model,
    step_cost: Callable,
    obs_fn: Callable,  # (qpos, qvel, time) -> observation vector
    network,
    mppi_config: mppi.MPPIConfig = mppi.MPPIConfig(),
    config: DistillConfig = DistillConfig(),
    plant_substeps: int = 10,
    action_ref_fn: Callable = None,  # (time,) -> (nu,) feed-forward ref
    with_prev_ctrl: bool = False,
    payload_range: tuple = None,  # (lo, hi) kg -> payload-randomized DAgger
    command_dim: int = 0,  # >0 -> command-conditioned DAgger
    plant_k_tile: int = None,  # pallas plant lane tile; default = S
    anchor_w: float = 0.0,  # >0 -> expert anchored to action_ref_fn
):
    """Returns (init, round_fn, eval_fn).

    ``round_fn(dstate, plant_states, round_idx)`` runs one DAgger round:
    batched MPC experts label every visited state; the student trains on
    the labels; the student progressively drives (beta = beta_decay^round).

    ``eval_fn(dstate, plant_states, ticks)`` is the proof rollout: the
    STUDENT drives every scenario for ``ticks`` control periods while the
    expert labels each visited state in parallel — returns per-tick trunk
    trajectories plus student-vs-expert action RMSE along the student's own
    trajectory (the honest imitation metric: on-distribution for the
    student, not for the expert).

    With ``action_ref_fn`` the student learns the RESIDUAL around a
    feed-forward reference (e.g. ``costs.trot_gait_ref``): labels are
    ``expert - u_ref(t)`` and the deployed action is ``net(obs) +
    u_ref(t)`` — the same policy decomposition as the reference's
    phase-conditioned symmetric gait (deltas around the stand pose,
    sim2real/train.py:235-285), and a far easier regression target than
    the full expert action.

    ``payload_range=(lo, hi)`` (engine="pallas" only) runs
    payload-randomized DAgger: each scenario carries a trunk payload
    sampled uniformly from the range, the EXPERT plans with its
    scenario's payload (``make_solver(with_payload=True)``), the plant
    integrates it on the kernel's payload lanes — and the STUDENT does
    NOT observe it, so it must learn a load-robust gait (the
    domain-randomization option of BASELINE config 5).  ``round_fn`` /
    ``collect`` / ``eval_fn`` then take a trailing ``payloads (S,)``
    argument.

    ``command_dim > 0`` runs COMMAND-CONDITIONED DAgger (BASELINE config 5
    "velocity-command curriculum"): each scenario carries a command vector
    (e.g. ``(vx, vy, yaw_target)`` for ``costs.trot_cost_cmd``); the
    EXPERT plans for its scenario's command
    (``make_solver(with_command=True)``) and the STUDENT observes it
    (appended to the observation), so one student learns the whole command
    family — the MPC analog of the reference's per-reset randomized
    desired velocity (environments/WalkEnvironment.py:138-151).
    ``round_fn`` / ``collect`` / ``eval_fn`` then take a trailing
    ``commands (S, command_dim)`` argument (after ``payloads`` if both are
    enabled); the widening curriculum over command ranges lives in the
    driver (scripts/distill_cmd.py).

    ``with_prev_ctrl`` appends the previously APPLIED ctrl to the
    observation (the reference envs' last-action term,
    WalkEnvironment.py:115-136).  This matters for imitating a
    receding-horizon expert: its action is a function of (state, warm
    -started plan), and the previous action is the best cheap observable
    proxy for the hidden plan state — without it the conditional label
    distribution is wide and the regressed mean washes the gait out."""
    use_payload = payload_range is not None
    use_command = command_dim > 0
    if use_payload:
        assert mppi_config.engine == "pallas", \
            "payload randomization rides the fused kernel's payload lanes"
    if anchor_w > 0.0:
        assert action_ref_fn is not None, \
            "anchor_w anchors the expert to action_ref_fn"
    # anchor_w > 0 prices the expert's plan-retiming freedom: unanchored,
    # the warm-started nominal drifts in phase from u_ref and the labels
    # (expert - u_ref) inherit ~gait-amplitude hidden-state dependence the
    # student cannot regress (the measured stand-collapse, docs/PARITY.md)
    solve = mppi.make_solver(model, step_cost, mppi_config,
                             with_payload=use_payload,
                             with_command=use_command,
                             u_ref_fn=(action_ref_fn if anchor_w > 0.0
                                       else None),
                             anchor_w=anchor_w)
    tx = optax.adam(config.lr)
    S = config.num_scenarios
    lo, hi = jnp.asarray(model.actuator_ctrlrange).T

    if mppi_config.engine == "pallas":
        # Plant MUST integrate through the same engine as the expert's
        # rollouts: mixing the fused kernel (planner) with the op-graph
        # plant is a model mismatch that makes the robot slide (the same
        # rule as solvers/mpc.py:46-53).
        from ..ops.pallas_step import build_pallas_substep

        _plant_sub = build_pallas_substep(
            model, float(model.timestep), k_tile=plant_k_tile or S,
            n_substeps=plant_substeps, with_payload=use_payload)

        def plant_step(plants: State, ctrl, payloads=None):
            if use_payload:
                qp, qv = _plant_sub(plants.qpos.T, plants.qvel.T, ctrl.T,
                                    None, payloads[None, :])
            else:
                qp, qv = _plant_sub(plants.qpos.T, plants.qvel.T, ctrl.T)
            return State(qpos=qp.T, qvel=qv.T,
                         time=plants.time
                         + plant_substeps * float(model.timestep))
    else:

        def plant_step(plants: State, ctrl, payloads=None):
            plants2, _ = jax.vmap(
                lambda s, c: dynamics.step(model, s, c, None,
                                           n_substeps=plant_substeps)
            )(plants, ctrl)
            return plants2

    # action_ref_fn may be (t) -> u_ref or, for command-conditioned
    # distillation, (t, cmd) -> u_ref (the command-scaled gait reference,
    # costs.trot_gait_ref_cmd) — detected by the shared arity convention
    from ..solvers.costs import ref_takes_cmd as _arity

    ref_takes_cmd = action_ref_fn is not None and _arity(action_ref_fn)
    if ref_takes_cmd:
        assert use_command, "command-scaled u_ref needs command_dim > 0"

    def _ref(t, cmd):
        if action_ref_fn is None:
            return jnp.zeros((model.nu,))
        if ref_takes_cmd:
            return action_ref_fn(t, cmd)
        return action_ref_fn(t)

    home_ctrl = jnp.asarray(np.clip(
        np.asarray(model.key_ctrl[0], np.float32),
        np.asarray(model.actuator_ctrlrange)[:, 0],
        np.asarray(model.actuator_ctrlrange)[:, 1]))

    def full_obs(qpos, qvel, t, prev_ctrl, cmd):
        o = obs_fn(qpos, qvel, t)
        if with_prev_ctrl:
            o = jnp.concatenate([o, prev_ctrl - home_ctrl])
        if use_command:
            o = jnp.concatenate([o, cmd])
        return o

    def _cmds(commands):
        """Per-scenario command rows for vmapped call sites (zero-width
        when the distiller is not command-conditioned)."""
        if use_command:
            assert commands is not None, "distiller built with command_dim"
            return jnp.asarray(commands, jnp.float32)
        return jnp.zeros((S, 0), jnp.float32)

    def student_act(params, obs, t, cmds):
        out = network.apply(params, obs)
        pred = out[0] if isinstance(out, tuple) else out
        return jnp.clip(pred + jax.vmap(_ref)(t, cmds), lo, hi)

    def init(key, example_state: State):
        k1, k2 = jax.random.split(key)
        obs = full_obs(example_state.qpos, example_state.qvel,
                       example_state.time, home_ctrl,
                       jnp.zeros(command_dim))
        params = network.init(k1, obs[None])
        return DistillState(params=params, opt_state=tx.init(params), key=k2)

    def _expert(plants, mstates, keys, payloads, commands):
        aux = ()
        if use_payload:
            aux += (payloads,)
        if use_command:
            aux += (jnp.asarray(commands, jnp.float32),)
        return jax.vmap(solve)(plants, mstates, keys, *aux)

    def collect(dstate: DistillState, plants: State, mppi_states, beta,
                payloads=None, commands=None):
        """Scan expert-labeled rollouts across all scenarios."""
        cmds = _cmds(commands)

        def tick(carry, _):
            plants, mstates, key, prev = carry
            key, k1, k2 = jax.random.split(key, 3)
            expert_ctrl, mstates, _ = _expert(
                plants, mstates, jax.random.split(k1, S), payloads, commands
            )
            obs = jax.vmap(full_obs)(plants.qpos, plants.qvel,
                                     plants.time, prev, cmds)
            student_ctrl = student_act(dstate.params, obs, plants.time,
                                       cmds)
            drive_expert = jax.random.bernoulli(k2, beta, (S, 1))
            ctrl = jnp.where(drive_expert, expert_ctrl, student_ctrl)
            label = expert_ctrl - jax.vmap(_ref)(plants.time, cmds)
            plants = plant_step(plants, ctrl, payloads)
            return (plants, mstates, key, ctrl), \
                (obs, label, student_ctrl, plants.qpos)

        prev0 = jnp.tile(home_ctrl[None], (S, 1))
        (plants, mppi_states, key, _), (obs, labels, student, qpos) = \
            jax.lax.scan(
                tick, (plants, mppi_states, dstate.key, prev0), None,
                length=config.rollout_ticks,
            )
        return plants, mppi_states, key, obs.reshape(-1, obs.shape[-1]), \
            labels.reshape(-1, labels.shape[-1])

    def eval_fn(dstate: DistillState, plants: State, ticks: int,
                payloads=None, commands=None):
        cmds = _cmds(commands)
        mppi_states = jax.vmap(
            lambda _: mppi.init_state(model, mppi_config))(jnp.arange(S))

        def tick(carry, _):
            plants, mstates, key, prev = carry
            key, k1 = jax.random.split(key)
            expert_ctrl, mstates, _ = _expert(
                plants, mstates, jax.random.split(k1, S), payloads, commands
            )
            obs = jax.vmap(full_obs)(plants.qpos, plants.qvel,
                                     plants.time, prev, cmds)
            ctrl = student_act(dstate.params, obs, plants.time,
                               cmds)  # STUDENT
            plants = plant_step(plants, ctrl, payloads)
            err2 = jnp.mean(jnp.square(ctrl - expert_ctrl))
            return (plants, mstates, key, ctrl), (plants.qpos, ctrl, err2)

        prev0 = jnp.tile(home_ctrl[None], (S, 1))
        (plants, _, _, _), (qpos_traj, ctrl_traj, err2) = jax.lax.scan(
            tick, (plants, mppi_states, dstate.key, prev0), None,
            length=ticks)
        return dict(
            qpos_traj=qpos_traj,                      # (ticks, S, nq)
            ctrl_traj=ctrl_traj,                      # (ticks, S, nu)
            action_rmse=jnp.sqrt(jnp.mean(err2)),
            final_x=plants.qpos[:, 0],
            final_z=plants.qpos[:, 2],
        )

    def train_on(dstate: DistillState, obs, labels, key):
        n = obs.shape[0]
        mb = min(config.batch_size, n)

        def epoch(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, n)[: (n // mb) * mb]
            idxs = perm.reshape(-1, mb)

            def mini(carry, idx):
                params, opt_state = carry

                def loss_fn(p):
                    out = network.apply(p, obs[idx])
                    pred = out[0] if isinstance(out, tuple) else out
                    return jnp.mean(jnp.square(pred - labels[idx]))

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state)
                return (optax.apply_updates(params, updates), opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                mini, (params, opt_state), idxs
            )
            return (params, opt_state), losses.mean()

        (params, opt_state), losses = jax.lax.scan(
            epoch, (dstate.params, dstate.opt_state),
            jax.random.split(key, config.epochs_per_round),
        )
        return dstate.replace(params=params, opt_state=opt_state), losses[-1]

    def round_fn(dstate: DistillState, plants: State, round_idx: int,
                 payloads=None, commands=None):
        beta = config.beta_decay ** round_idx
        mppi_states = jax.vmap(lambda _: mppi.init_state(model, mppi_config))(
            jnp.arange(S)
        )
        plants, _, key, obs, labels = collect(
            dstate, plants, mppi_states, beta, payloads, commands
        )
        key, sub = jax.random.split(key)
        dstate, loss = train_on(dstate.replace(key=key), obs, labels, sub)
        return dstate, plants, dict(distill_loss=loss, beta=beta)

    return Distiller(init, round_fn, eval_fn, collect, train_on)

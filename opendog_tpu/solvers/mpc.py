"""Receding-horizon MPC controller loop at a 50 Hz real-time budget.

Runs solver + plant fully on-device: one jitted ``control_tick`` advances the
real plant by one 50 Hz control step using the solver's first action and
re-plans.  ``run`` scans N ticks on-device (for benchmarking / batch
evaluation); ``RealtimeController`` exposes a host-side tick for the robot
bridge (12.5 Hz loop of the reference, ``sim2real/run_robot.py:37``).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..physics import State, Terrain, dynamics
from . import mppi


@struct.dataclass
class MPCCarry:
    plant: State
    solver: mppi.MPPIState
    key: jax.Array


def make_mpc(
    model,
    step_cost: Callable,
    config: mppi.MPPIConfig = mppi.MPPIConfig(),
    plant_substeps: int = 10,
    terrain: Optional[Terrain] = None,
):
    """Returns (init(key, physics_state) -> carry, tick(carry) -> (carry,
    info), run(carry, n) -> (carry, traj))."""
    solve = mppi.make_solver(model, step_cost, config, terrain=terrain)

    if config.engine == "pallas" and terrain is None:
        # Plant integrates through the fused kernel too: on TPU the
        # op-graph path's default-precision MXU matmuls cost ~7e-3 qvel
        # error per substep (vs 3e-6 for the fused f32 VPU kernel).
        from ..ops.pallas_step import build_pallas_substep

        plant_sub = build_pallas_substep(
            model, float(model.timestep), k_tile=1,
            n_substeps=plant_substeps,
        )

        def plant_step(st: State, ctrl):
            qp, qv = plant_sub(st.qpos[:, None], st.qvel[:, None],
                               ctrl[:, None])
            t2 = st.time + plant_substeps * float(model.timestep)
            return State(qpos=qp[:, 0], qvel=qv[:, 0], time=t2)
    else:

        def plant_step(st: State, ctrl):
            st2, _ = dynamics.step(model, st, ctrl, terrain,
                                   n_substeps=plant_substeps)
            return st2

    def init(key, physics_state: State) -> MPCCarry:
        return MPCCarry(
            plant=physics_state,
            solver=mppi.init_state(model, config),
            key=key,
        )

    def tick(carry: MPCCarry):
        key, sub = jax.random.split(carry.key)
        ctrl, solver_state, stats = solve(carry.plant, carry.solver, sub)
        plant = plant_step(carry.plant, ctrl)
        out = dict(ctrl=ctrl, qpos=plant.qpos, qvel=plant.qvel, **stats)
        return MPCCarry(plant=plant, solver=solver_state, key=key), out

    def run(carry: MPCCarry, n_ticks: int):
        return jax.lax.scan(lambda c, _: tick(c), carry, None, length=n_ticks)

    return init, tick, run


def make_ilqr_tracker(
    model,
    step_cost: Callable,
    ilqr_config=None,
    track_ticks: int = 50,
    plant_substeps: int = 10,
    terrain: Optional[Terrain] = None,
):
    """BASELINE config 3: whole-body iLQR with a slow replan + fast tracking
    loop — replan the full horizon once per ``track_ticks`` control ticks
    (1 Hz replan / 50 Hz tracking at the defaults), and between replans
    execute the time-varying LQR policy u_t = U*_t + K_t (x - X*_t) from the
    last solve.  The whole replan+track cycle is one jitted function.
    """
    from . import ilqr as ilqr_mod

    if ilqr_config is None:
        ilqr_config = ilqr_mod.ILQRConfig(
            horizon=50, n_substeps=10, rollout_dt=0.002, iterations=5
        )
    assert ilqr_config.horizon >= track_ticks
    solve = ilqr_mod.make_ilqr(model, step_cost, ilqr_config,
                               terrain=terrain)
    nq = model.nq
    lo = np.asarray(model.actuator_ctrlrange)[:, 0]
    hi = np.asarray(model.actuator_ctrlrange)[:, 1]

    def cycle(plant: State, U_init: jax.Array):
        """One replan + ``track_ticks`` tracked plant ticks.  Returns
        (plant', U_next_init, traj dict)."""
        U, X, stats = solve(plant, U_init)
        # feedback gains along the optimised trajectory
        A = jax.vmap(jax.jacfwd(lambda x, u: _f(x, u), argnums=0))(
            X[:-1], U)
        B = jax.vmap(jax.jacfwd(lambda x, u: _f(x, u), argnums=1))(
            X[:-1], U)
        # cheap stationary LQR gains around the plan via the associative pass
        nx = X.shape[-1]
        lx = jnp.zeros((U.shape[0], nx))
        lu = jnp.zeros_like(U)
        lxx = jnp.tile(jnp.eye(nx)[None], (U.shape[0], 1, 1))
        luu = jnp.tile((jnp.eye(model.nu) * 1e-2)[None], (U.shape[0], 1, 1))
        lux = jnp.zeros((U.shape[0], model.nu, nx))
        k_ff, K_fb = ilqr_mod.associative_lqr_gains(
            A, B, lx, lu, lxx, luu, lux, jnp.zeros(nx), jnp.eye(nx), 1e-6
        )

        def track(carry, t):
            st = carry
            x = jnp.concatenate([st.qpos, st.qvel])
            u = jnp.clip(U[t] + K_fb[t] @ (x - X[t]), lo, hi)
            st2, _ = dynamics.step(model, st, u, terrain,
                                   n_substeps=plant_substeps)
            return st2, dict(qpos=st2.qpos, ctrl=u)

        plant2, traj = jax.lax.scan(
            track, plant, jnp.arange(track_ticks)
        )
        U_next = jnp.concatenate(
            [U[track_ticks:],
             jnp.tile(U[-1:], (track_ticks, 1))], axis=0
        )
        traj["cost"] = stats["cost"]
        return plant2, U_next, traj

    def _f(x, u):
        st = State(qpos=x[:nq], qvel=x[nq:], time=jnp.zeros(()))
        st2, _ = dynamics.step(
            model.replace(timestep=ilqr_config.rollout_dt), st, u, terrain,
            n_substeps=ilqr_config.n_substeps,
        )
        return jnp.concatenate([st2.qpos, st2.qvel])

    return cycle

"""Receding-horizon MPC controller loop at a 50 Hz real-time budget.

Runs solver + plant fully on-device: one jitted ``control_tick`` advances the
real plant by one 50 Hz control step using the solver's first action and
re-plans.  ``run`` scans N ticks on-device (for benchmarking / batch
evaluation); ``RealtimeController`` exposes a host-side tick for the robot
bridge (12.5 Hz loop of the reference, ``sim2real/run_robot.py:37``).
"""
from __future__ import annotations

from typing import Callable, Optional

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

    def init(key, physics_state: State) -> MPCCarry:
        return MPCCarry(
            plant=physics_state,
            solver=mppi.init_state(model, config),
            key=key,
        )

    def tick(carry: MPCCarry):
        key, sub = jax.random.split(carry.key)
        ctrl, solver_state, stats = solve(carry.plant, carry.solver, sub)
        plant, info = dynamics.step(
            model, carry.plant, ctrl, terrain, n_substeps=plant_substeps
        )
        out = dict(ctrl=ctrl, qpos=plant.qpos, qvel=plant.qvel, **stats)
        return MPCCarry(plant=plant, solver=solver_state, key=key), out

    def run(carry: MPCCarry, n_ticks: int):
        return jax.lax.scan(lambda c, _: tick(c), carry, None, length=n_ticks)

    return init, tick, run

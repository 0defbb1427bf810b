"""Receding-horizon MPC controller loop at a 50 Hz real-time budget.

Runs solver + plant fully on-device: one jitted ``control_tick`` advances the
real plant by one 50 Hz control step using the solver's first action and
re-plans.  ``run`` scans N ticks on-device (for benchmarking / batch
evaluation); ``RealtimeController`` exposes a host-side pipelined tick for
the robot bridge (the reference's hardware loop runs 12.5 Hz,
``sim2real/run_robot.py:37``; ours meets the 50 Hz p99 budget — bench.py).
"""
from __future__ import annotations

from collections import deque
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
    # FIFO of not-yet-applied controls when ctrl_lag > 0 (shape (lag, nu));
    # scalar 0 when the loop runs lag-free
    ctrl_queue: jax.Array = struct.field(default=0)


def _make_plant_step(model, config, plant_substeps, terrain,
                     terrain_plant: str = "exact"):
    """One 50 Hz plant tick (plant_substeps physics substeps).

    With the fused engine the plant integrates through the Pallas kernel
    too: on TPU the op-graph path's default-precision MXU matmuls cost
    ~7e-3 qvel error per substep (vs 3e-6 for the fused f32 VPU kernel),
    and planner/plant engine mismatch makes the robot slide.

    ``terrain_plant`` picks the terrain plant integrator:
      * ``"exact"`` (default) — op-graph XLA step with exact bilinear
        hfield contact.  The fidelity reference, but the op-overhead-bound
        XLA substep is ~86% of the terrain MPC tick
        (runs/terrain_profile/metrics.json).
      * ``"kernel"`` — the fused Pallas kernel with PER-GEOM local planes
        (``with_plane="per_geom"``) refreshed from the plant state every
        tick: each paw contacts the terrain's tangent plane at its own xy.
        Trajectory deviation vs "exact" is pinned in
        tests/test_pallas_core.py; use for throughput-bound loops."""
    if config.engine == "pallas" and terrain is not None \
            and terrain_plant == "kernel":
        from ..ops.pallas_step import build_pallas_substep

        # unroll=False: fori_loop substeps keep the plant-kernel trace at
        # ONE substep graph (87.6 -> 10.1 s of client-side tracing for
        # the go1 plant; the solver kernel stays unrolled — it is the
        # runtime hot path, the plant runs once per tick)
        plant_sub = build_pallas_substep(
            model, float(model.timestep), k_tile=1,
            n_substeps=plant_substeps, with_plane="per_geom",
            unroll=False,
        )

        def plant_step(st: State, ctrl):
            planes = dynamics.geom_local_planes(model, terrain, st.qpos)
            qp, qv = plant_sub(st.qpos[:, None], st.qvel[:, None],
                               ctrl[:, None], planes.reshape(-1)[:, None])
            t2 = st.time + plant_substeps * float(model.timestep)
            return State(qpos=qp[:, 0], qvel=qv[:, 0], time=t2)
    elif config.engine == "pallas" and terrain is None:
        from ..ops.pallas_step import build_pallas_substep

        # unroll=False is BIT-IDENTICAL to the unrolled flat plant
        # (tests/test_pallas_core.py) and cuts its trace time ~9x
        plant_sub = build_pallas_substep(
            model, float(model.timestep), k_tile=1,
            n_substeps=plant_substeps, unroll=False,
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

    return plant_step


def make_mpc(
    model,
    step_cost: Callable,
    config: mppi.MPPIConfig = mppi.MPPIConfig(),
    plant_substeps: int = 10,
    terrain: Optional[Terrain] = None,
    mesh=None,
    sample_axis: str = "mp",
    ctrl_lag: int = 0,
    lag_compensation: bool = False,
    terrain_plant: str = "exact",
    plane_mode: str = "trunk",
):
    """Returns (init(key, physics_state) -> carry, tick(carry) -> (carry,
    info), run(carry, n) -> (carry, traj)).  ``mesh`` shards the MPPI
    sample axis over devices (see ``mppi.make_solver``).

    ``ctrl_lag`` simulates the deployment pipeline ON-DEVICE: the plant
    applies the solve from ``ctrl_lag`` ticks ago (exactly what
    ``RealtimeController`` does over the tunnel with ``lag`` pipelining),
    so the price of acting on an old plan is measurable in sim
    (scripts/lag_sweep.py, VERDICT r2 item 5).

    ``lag_compensation`` removes that price: before solving, the
    current plant state is rolled forward through the ``ctrl_lag`` queued
    (dispatched-but-not-yet-applied) controls, so the solve plans from the
    predicted state AT WHICH ITS ACTION WILL ACTUALLY BE APPLIED — classic
    delay compensation, ``ctrl_lag`` extra plant steps per solve (~lag/K
    of one rollout's cost, negligible).  Measured recovery
    (scripts/lag_sweep.py --compensate, TPU v5e, bench trot config):
    uncompensated lag=3 loses 33% of distance and falls 1/3 of seeds
    (final_x 4.21 -> 2.81 m); compensated lag 1/2/3/5 all match lag-0
    (final_x 4.27-4.42 m, zero falls, vx_rmse ~= lag-0's 0.169 —
    runs/lag_sweep/metrics_compensated.json)."""
    solve = mppi.make_solver(model, step_cost, config, terrain=terrain,
                             mesh=mesh, sample_axis=sample_axis,
                             plane_mode=plane_mode)
    plant_step = _make_plant_step(model, config, plant_substeps, terrain,
                                  terrain_plant=terrain_plant)

    rng = np.asarray(model.actuator_ctrlrange, np.float32)
    hold_ctrl = np.clip(np.asarray(model.key_ctrl[0], np.float32),
                        rng[:, 0], rng[:, 1])

    def init(key, physics_state: State) -> MPCCarry:
        queue = (jnp.tile(jnp.asarray(hold_ctrl)[None], (ctrl_lag, 1))
                 if ctrl_lag > 0 else jnp.zeros(()))
        return MPCCarry(
            plant=physics_state,
            solver=mppi.init_state(model, config),
            key=key,
            ctrl_queue=queue,
        )

    def tick(carry: MPCCarry):
        key, sub = jax.random.split(carry.key)
        solve_from = carry.plant
        if ctrl_lag > 0 and lag_compensation:
            # predict the state this solve's action will land on: roll
            # through the queued controls (static unroll, lag <= ~5)
            for i in range(ctrl_lag):
                solve_from = plant_step(solve_from, carry.ctrl_queue[i])
        ctrl, solver_state, stats = solve(solve_from, carry.solver, sub)
        if ctrl_lag > 0:
            applied = carry.ctrl_queue[0]
            queue = jnp.concatenate([carry.ctrl_queue[1:], ctrl[None]],
                                    axis=0)
        else:
            applied, queue = ctrl, carry.ctrl_queue
        plant = plant_step(carry.plant, applied)
        out = dict(ctrl=applied, qpos=plant.qpos, qvel=plant.qvel, **stats)
        if ctrl_lag > 0 and lag_compensation:
            # debug/verification output: the predicted application state.
            # Deterministic plant => must equal the ACTUAL plant state
            # ctrl_lag ticks later (pinned by tests/test_lag_compensation)
            out["solve_from_qpos"] = solve_from.qpos
        return MPCCarry(plant=plant, solver=solver_state, key=key,
                        ctrl_queue=queue), out

    def run(carry: MPCCarry, n_ticks: int):
        return jax.lax.scan(lambda c, _: tick(c), carry, None, length=n_ticks)

    return init, tick, run


class RealtimeController:
    """Host-side pipelined MPC tick for a robot bridge at a 50 Hz budget.

    Remote-TPU device->host fetches are latency-bound (~40 ms RTT over
    the axon tunnel, measured) while dispatch is ~0.01 ms and
    ``copy_to_host_async`` genuinely overlaps with host wall time, so the
    controller runs the solve pipeline ``lag`` ticks deep: ``tick(state)``
    dispatches solve(t) against the measured plant state, starts an async
    host copy of its first action, and returns ctrl(t-lag).  In a control
    loop paced at the tick period, that copy has had ``lag`` ticks of wall
    time to land — pick ``lag >= ceil(RTT / tick_period) + 1`` (3 at 50 Hz
    over the tunnel) and the read is ~0.2 ms.  Receding-horizon MPC is
    robust to acting on a plan from ``lag`` ticks ago (the nominal is
    shifted each solve); the reference's own hardware loop tolerates 80 ms
    control periods (``sim2real/run_robot.py:37``).

    With ``state=None`` the controller advances an internal on-device
    plant instead (benchmark mode — the bench.py host-loop metric).

    ``compensate=True`` applies delay compensation: the (measured or
    internal) state is rolled forward on-device through the ``lag``
    dispatched-but-not-yet-applied controls before solving, so each solve
    plans from the predicted state its action will actually land on
    (``make_mpc(lag_compensation=...)`` semantics; measured recovery in
    runs/lag_sweep).  In benchmark mode this also makes the internal plant
    apply the solve from ``lag`` ticks ago (full pipeline emulation) —
    without it the internal plant applies the fresh solve.  Costs ``lag``
    extra plant steps per solve — negligible next to ``num_samples *
    horizon`` rollout steps.
    """

    def __init__(self, model, step_cost, config: mppi.MPPIConfig,
                 terrain: Optional[Terrain] = None, lag: int = 1,
                 plant_substeps: int = 10, key=None,
                 compensate: bool = False):
        self.lag = max(0, int(lag))
        self.compensate = bool(compensate) and self.lag > 0
        self.model = model
        # Benchmark mode honours ``compensate`` too: the internal plant then
        # applies the solve from ``lag`` ticks ago and each solve plans from
        # the predicted application state (full deployment-pipeline
        # emulation).  Without compensate the internal plant applies the
        # fresh solve (pure solver-throughput mode, bench.py's metric).
        init, tick, _ = make_mpc(model, step_cost, config,
                                 plant_substeps=plant_substeps,
                                 terrain=terrain,
                                 ctrl_lag=self.lag if self.compensate else 0,
                                 lag_compensation=self.compensate)
        self._carry = None  # set by start()
        self._init = init
        # host-loop tick returns only (carry, ctrl): everything else is
        # dead-code-eliminated; the carry is donated so plant/solver
        # buffers are reused in place on device
        self._jtick = jax.jit(
            lambda c: (lambda c2, out: (c2, out["ctrl"]))(*tick(c)),
            donate_argnums=0,
        )
        solve = mppi.make_solver(model, step_cost, config, terrain=terrain)
        # bridge tick: measured plant state in, ctrl out (no internal plant)
        self._jsolve = jax.jit(
            lambda st, ms, k: (lambda ctrl, ms2, stats:
                               (ctrl, ms2))(*solve(st, ms, k)),
            donate_argnums=1,
        )
        if self.compensate:
            plant_step = _make_plant_step(model, config, plant_substeps,
                                          terrain)

            def comp_solve(st, queue, ms, k):
                # roll the measured state through the in-flight controls
                # (applied at the robot over the next `lag` ticks)
                for i in range(self.lag):
                    st = plant_step(st, queue[i])
                ctrl, ms2, _stats = solve(st, ms, k)
                queue2 = jnp.concatenate([queue[1:], ctrl[None]], axis=0)
                return ctrl, ms2, queue2

            self._jsolve_comp = jax.jit(comp_solve, donate_argnums=(1, 2))
            self._queue_dev = None  # device-side in-flight ctrl FIFO
        self._config = config
        self._pending = deque()
        self._solver_state = None
        self._key = key if key is not None else jax.random.PRNGKey(0)
        # placeholder returned until the pipeline is primed: the keyframe
        # ctrl clipped into ctrlrange (keyframes may sit just outside it)
        rng = np.asarray(model.actuator_ctrlrange, np.float32)
        self._last_ctrl = np.clip(
            np.asarray(model.key_ctrl[0], np.float32), rng[:, 0], rng[:, 1])

    # -------- benchmark mode (internal on-device plant) ----------------
    def start(self, physics_state: State):
        # split rather than hand self._key to the carry: the carry is
        # DONATED every tick, which deletes its input buffers — an aliased
        # self._key would be dead after the first tick (and bridge_tick
        # would then crash on a deleted array)
        self._key, sub = jax.random.split(self._key)
        self._carry = self._init(sub, physics_state)

    def tick(self) -> np.ndarray:
        """One pipelined control tick; returns ctrl(t-lag) as numpy."""
        self._carry, ctrl = self._jtick(self._carry)
        ctrl.copy_to_host_async()
        self._pending.append(ctrl)
        if len(self._pending) > self.lag:
            self._last_ctrl = np.asarray(self._pending.popleft())
        return self._last_ctrl

    def drain(self) -> np.ndarray:
        """Flush the pipeline (e.g. at shutdown)."""
        while self._pending:
            self._last_ctrl = np.asarray(self._pending.popleft())
        if self.compensate:
            # the in-flight FIFO no longer matches what the robot applies
            # after a drain; the next bridge_tick re-primes it with the
            # hold control
            self._queue_dev = None
        return self._last_ctrl

    # -------- bridge mode (external plant: the real robot) -------------
    def bridge_tick(self, qpos: np.ndarray, qvel: np.ndarray,
                    t: float = 0.0) -> np.ndarray:
        """One tick against a measured robot state; returns ctrl(t-lag)."""
        if self._solver_state is None:
            self._solver_state = mppi.init_state(self.model, self._config)
        self._key, sub = jax.random.split(self._key)
        st = State(qpos=jnp.asarray(qpos, jnp.float32),
                   qvel=jnp.asarray(qvel, jnp.float32),
                   time=jnp.asarray(t, jnp.float32))
        if self.compensate:
            if self._queue_dev is None:
                # prime with what the robot is actually doing pre-pipeline:
                # holding the keyframe stance (= _last_ctrl placeholder)
                self._queue_dev = jnp.tile(
                    jnp.asarray(self._last_ctrl, jnp.float32)[None],
                    (self.lag, 1))
            ctrl, self._solver_state, self._queue_dev = self._jsolve_comp(
                st, self._queue_dev, self._solver_state, sub)
        else:
            ctrl, self._solver_state = self._jsolve(
                st, self._solver_state, sub)
        ctrl.copy_to_host_async()
        self._pending.append(ctrl)
        if len(self._pending) > self.lag:
            self._last_ctrl = np.asarray(self._pending.popleft())
        return self._last_ctrl


def make_ilqr_tracker(
    model,
    step_cost: Callable,
    ilqr_config=None,
    track_ticks: int = 50,
    plant_substeps: int = 10,
    terrain: Optional[Terrain] = None,
    u_ref_fn: Optional[Callable] = None,
):
    """BASELINE config 3: whole-body iLQR with a slow replan + fast tracking
    loop — replan the full horizon once per ``track_ticks`` control ticks
    (1 Hz replan / 50 Hz tracking at the defaults), and between replans
    execute the time-varying LQR policy u_t = U*_t + K_t (x - X*_t) from the
    last solve.  The whole replan+track cycle is one jitted function.

    Two lessons from the r4 crouched-march failure (VERDICT r4 item 2)
    are baked into how this is meant to be configured:

    * **Plan at the plant's integration rate.**  With a coarser plan
      integrator (e.g. 10 ms substeps vs the 2 ms plant) the plan is not
      a trajectory the plant can realize — the LQR "tracking error" is
      really model mismatch through stiff contact, measured at 3-4 cm of
      trunk height PER CYCLE, and each replan then starts from a sunk
      state until the solve settles into a crouched march.  At matched
      rates the tracked rollout reproduces the plan to ~0 gap and the
      death spiral disappears at its root (.scratch-measured, pinned by
      tests/test_contact_schedule.py::test_scheduled_trot_multicycle_z_band).

    * **Warm-start from the gait reference** (``u_ref_fn``, e.g.
      ``costs.trot_gait_ref``).  The default receding warm start
      degenerates to ``tile(U[-1])`` when ``track_ticks == horizon`` —
      every replan restarts iLQR from a constant-control guess, and a
      bounded-iteration solve from a bad guess can land in the crouch
      basin.  With ``u_ref_fn`` every cycle's solve starts from the
      canonical gait at the correct phase (same decomposition as the
      anchored-MPPI distillation expert), so solve quality cannot decay
      cycle over cycle.
    """
    from . import ilqr as ilqr_mod

    if ilqr_config is None:
        ilqr_config = ilqr_mod.ILQRConfig(
            horizon=50, n_substeps=10, rollout_dt=0.002, iterations=5
        )
    assert ilqr_config.horizon >= track_ticks
    solve = ilqr_mod.make_ilqr(model, step_cost, ilqr_config,
                               terrain=terrain)
    lo = np.asarray(model.actuator_ctrlrange)[:, 0]
    hi = np.asarray(model.actuator_ctrlrange)[:, 1]
    stage_dt = ilqr_config.n_substeps * ilqr_config.rollout_dt

    def cycle(plant: State, U_init: jax.Array):
        """One replan + ``track_ticks`` tracked plant ticks.  Returns
        (plant', U_next_init, traj dict)."""
        U, X, stats = solve(plant, U_init)
        # time-varying LQR feedback gains from the solve's own final
        # backward pass (the true cost expansion along the plan, not an
        # ad-hoc stationary LQR)
        K_fb = stats["K_fb"]

        def track(carry, t):
            st = carry
            x = jnp.concatenate([st.qpos, st.qvel])
            with jax.default_matmul_precision("highest"):
                # the feedback matvec must be guarded too: default MXU
                # rounding in the CONTROL (not just the physics) is enough
                # to push the marginally-damped gait off the CPU-f32
                # trajectory (docs/PRECISION.md failure class)
                u = jnp.clip(U[t] + K_fb[t] @ (x - X[t]), lo, hi)
                st2, _ = dynamics.step(model, st, u, terrain,
                                       n_substeps=plant_substeps)
            return st2, dict(qpos=st2.qpos, ctrl=u)

        plant2, traj = jax.lax.scan(
            track, plant, jnp.arange(track_ticks)
        )
        if u_ref_fn is not None:
            # canonical warm start: the gait reference at the next
            # cycle's absolute stage times (see docstring)
            ts = plant2.time + stage_dt * jnp.arange(ilqr_config.horizon)
            U_next = jnp.clip(jax.vmap(u_ref_fn)(ts),
                              jnp.asarray(lo), jnp.asarray(hi))
        else:
            U_next = jnp.concatenate(
                [U[track_ticks:],
                 jnp.tile(U[-1:], (track_ticks, 1))], axis=0
            )
        traj["cost"] = stats["cost"]
        return plant2, U_next, traj

    return cycle

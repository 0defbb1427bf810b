"""MPPI (Model Predictive Path Integral) solver — the sampling branch of the
north-star MPC engine (BASELINE.json configs 2 and 4).

TPU-first design: one solve is K vmapped rollouts of a ``lax.scan`` over the
horizon, entirely on-device inside a single jitted function — thousands of
batched rollouts per 50 Hz control tick.  The scenario axis (domain
randomization / multi-env MPC) is an additional vmap/shard_map axis on top
(SURVEY §2.8 DP row), and the K-sample axis itself shards over a device
mesh (``make_solver(..., mesh=)``): each device rolls out its slice of the
samples and the softmax-weighted nominal update is reduced with
``psum``/``pmin`` over ICI — the tensor-parallel analog of this engine
(SURVEY §2.8 TP row; BASELINE.json "reductions ride ICI collectives").
Noise is drawn per-sample from split keys so the N-device solve is
bit-comparable to the single-device solve (same draws, same softmax up to
reduction order).

Reference context: the reference has no MPC — its control is either a trained
policy (``sim2real/run_robot.py``) or scripted gaits; this solver is the
driver-mandated re-targeting of that control stack (BASELINE.json
north_star).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..physics import State, Terrain, dynamics


class MPPIConfig(NamedTuple):
    horizon: int = 25          # control steps (0.5 s at 50 Hz)
    num_samples: int = 256     # K rollouts per solve
    temperature: float = 0.3   # softmax lambda
    noise_sigma: float = 0.15  # exploration std in ctrl units [rad]
    n_substeps: int = 4        # physics substeps per control step
    rollout_dt: float = 0.0    # rollout physics dt; 0 -> model.timestep.
    # Planning may integrate coarser than the plant (e.g. 5 ms vs 2 ms):
    # horizon seconds = horizon * n_substeps * rollout_dt.
    smooth_alpha: float = 0.6  # noise low-pass (colored exploration)
    gamma: float = 1.0         # cost discount
    engine: str = "xla"        # "xla" | "pallas": rollout physics backend.
    # "pallas" runs the whole substep as one fused TPU kernel with the K
    # rollouts on the vector lanes — measured 12.5x faster AND ~2000x more
    # accurate than the op-graph path on TPU v5e (the op-graph einsums use
    # default-precision MXU matmuls; the fused kernel is pure f32 VPU math).
    # Requires flat-ground scenes (terrain=None).


@struct.dataclass
class MPPIState:
    """Carried between solves: the shifted nominal control plan."""

    nominal: jax.Array  # (H, nu)


def init_state(model, config: MPPIConfig, key_name: str = "home") -> MPPIState:
    ctrl0 = jnp.asarray(model.key_ctrl[model.key_id(key_name)])
    return MPPIState(nominal=jnp.tile(ctrl0[None], (config.horizon, 1)))


def make_solver(
    model,
    step_cost: Callable,
    config: MPPIConfig = MPPIConfig(),
    terminal_cost: Optional[Callable] = None,
    terrain: Optional[Terrain] = None,
    mesh: Optional[Mesh] = None,
    sample_axis: str = "mp",
    with_payload: bool = False,
    with_command: bool = False,
    u_ref_fn: Optional[Callable] = None,
    anchor_w: float = 0.0,
    plane_mode: str = "trunk",
):
    """Build ``solve(physics_state, mppi_state, key) -> (ctrl, mppi_state',
    stats)``.  Jit (or vmap for batched scenarios) the returned function.

    With ``mesh`` given, the K rollout samples are sharded over
    ``mesh[sample_axis]`` via ``shard_map``: each device rolls out
    K/n_devices candidates and the softmax-weighted update is reduced with
    ``pmin``/``psum`` collectives, bit-comparable (up to reduction order) to
    the single-device solve (tests/test_sharded_solvers.py).

    With ``with_payload=True`` (engine="pallas" only) the returned solve
    takes a trailing scalar ``payload`` argument — a point mass [kg]
    rigidly attached at the trunk origin, carried on the kernel's payload
    lanes — so the controller PLANS with the load it knows it carries
    (and domain-randomized training can vary it per scenario).

    With ``with_command=True`` the solve takes a trailing ``command``
    vector forwarded to ``step_cost(state, ctrl, prev_ctrl, command)`` —
    runtime task conditioning (commanded velocity / heading,
    ``costs.trot_cost_cmd``) without recompiling per command, mirroring
    the reference's randomized desired velocity
    (WalkEnvironment.py:138-151).  Composable with ``with_payload``;
    argument order is ``solve(state, mppi, key[, payload][, command])``.

    With ``u_ref_fn`` + ``anchor_w > 0`` the solve is ANCHORED to a
    time-indexed action reference (e.g. ``costs.trot_gait_ref_cmd``):
    every candidate plan pays ``anchor_w * sum_k ||u_k -
    u_ref(t + k*dt)||^2`` on top of its rollout cost.  This prices the
    solver's freedom to re-time the gait: a free receding-horizon expert
    expresses its corrections through warm-started plan state that drifts
    in phase from the reference, which makes its actions depend on hidden
    history — measured |expert - u_ref| ~ the gait amplitude itself, an
    unlearnable distillation target (the round-3/4 stand-collapse).
    Anchored, the expert's actions stay near ``u_ref`` and its residual
    is small, state-predictable feedback.  ``u_ref_fn`` is ``(t) ->
    (nu,)`` or, with ``with_command=True``, ``(t, cmd) -> (nu,)``
    (arity-detected).  ``anchor_w = 0`` (default) is the exact unanchored
    solver.

    ``plane_mode`` (terrain + engine="pallas" only) picks the kernel's
    local-plane terrain representation for the rollouts: ``"trunk"``
    (default, the committed bench-2c semantics) evaluates ONE tangent
    plane at the trunk's xy shared by all paws; ``"per_geom"`` gives
    every collision geom the terrain's tangent plane at its own xy
    (``with_plane="per_geom"`` — strictly higher fidelity on slopes,
    where the shared trunk plane biases the pitch equilibrium; ~zero
    extra cost, the plane rows are constants within the solve).

    PERF: keep the receding-horizon loop ON-DEVICE (``lax.scan`` over
    ticks, as ``make_mpc(...).run`` does).  Feeding the returned
    ``MPPIState`` — a shard_map output committed to the mesh — back
    through a *separate host dispatch* forces a reshard each call
    (measured ~230 ms/call over the remote-device tunnel vs 1.25 ms/tick
    scanned on-device)."""
    lo = np.asarray(model.actuator_ctrlrange)[:, 0]
    hi = np.asarray(model.actuator_ctrlrange)[:, 1]
    H, K, nu = config.horizon, config.num_samples, model.nu
    n_shards = int(mesh.shape[sample_axis]) if mesh is not None else 1
    assert K % n_shards == 0, "num_samples must divide the sample mesh axis"
    K_local = K // n_shards
    rollout_model = (
        model.replace(timestep=config.rollout_dt) if config.rollout_dt else model
    )

    anchored = u_ref_fn is not None and anchor_w > 0.0
    if anchored:
        from .costs import ref_takes_cmd

        _ref_takes_cmd = ref_takes_cmd(u_ref_fn)
        if _ref_takes_cmd:
            assert with_command, \
                "command-indexed u_ref_fn needs with_command=True"

    def _ref_seq(state: State, command) -> jax.Array:
        """(H, nu) anchor targets: plan slot k applies from
        ``state.time + k*dt_tick`` (same convention as the distiller's
        ``label = expert - u_ref(state.time)`` at k = 0)."""
        dt_tick = float(rollout_model.timestep) * config.n_substeps
        ts = state.time + dt_tick * jnp.arange(H, dtype=jnp.float32)
        if _ref_takes_cmd:
            return jax.vmap(lambda t: u_ref_fn(t, command))(ts)
        return jax.vmap(u_ref_fn)(ts)

    def _bind_cost(command):
        """step_cost with the runtime command bound (identity when the
        solver is not command-conditioned)."""
        if not with_command:
            return step_cost
        return lambda st, c, p: step_cost(st, c, p, command)

    def rollout_cost(state: State, ctrl_seq: jax.Array,
                     command=None) -> jax.Array:
        """Total cost of one control sequence (H, nu) from ``state``."""
        cost_fn = _bind_cost(command)

        def tick(carry, ctrl):
            st, prev_ctrl, disc = carry
            st2, _ = dynamics.step(
                rollout_model, st, ctrl, terrain, n_substeps=config.n_substeps
            )
            c = cost_fn(st2, ctrl, prev_ctrl) * disc
            return (st2, ctrl, disc * config.gamma), c

        (final, _, _), costs = jax.lax.scan(
            tick, (state, ctrl_seq[0], jnp.float32(1.0)), ctrl_seq, unroll=2
        )
        total = jnp.sum(costs)
        if terminal_cost is not None:
            total = total + terminal_cost(final)
        return total

    if with_payload:
        assert config.engine == "pallas", \
            "payload-aware solves ride the fused kernel's payload lanes"
    if config.engine == "pallas":
        from ..ops.pallas_step import build_pallas_substep

        k_tile = K_local if K_local < 256 else 256
        if terrain is not None and plane_mode == "per_geom":
            kernel_plane_mode = "per_geom"
        else:
            kernel_plane_mode = terrain is not None
        psub = build_pallas_substep(
            rollout_model, float(rollout_model.timestep),
            k_tile=k_tile, n_substeps=config.n_substeps,
            with_plane=kernel_plane_mode,
            with_payload=with_payload,
        )

    def _local_plane(state: State, k: int) -> jax.Array:
        """Per-lane contact plane(s): the terrain's tangent plane(s) under
        the solve-from state — the local-plane approximation that keeps
        terrain rollouts on the fused kernel (exact bilinear contact
        remains on the plant/op-graph path).  ``plane_mode="trunk"``:
        (4, k), one plane at the trunk xy shared by all geoms;
        ``"per_geom"``: (4*ngeom, k), each geom's own tangent plane."""
        if plane_mode == "per_geom":
            planes = dynamics.geom_local_planes(
                rollout_model, terrain, state.qpos
            )  # (ngeom, 4)
            return jnp.tile(planes.reshape(-1)[:, None], (1, k))
        h, n = dynamics._terrain_height_normal(
            rollout_model, terrain, state.qpos[None, :2]
        )
        n = n[0]
        p0 = jnp.array([state.qpos[0], state.qpos[1], h[0]])
        d = jnp.dot(n, p0)
        row = jnp.concatenate([n, d[None]])  # (4,)
        return jnp.tile(row[:, None], (1, k))

    def rollout_costs_pallas(state: State, candidates: jax.Array,
                             payload=None, command=None):
        """Rollout of all candidates via the fused kernel: carry is the
        (rows, k) lane layout, one pallas_call per control step."""
        cost_fn = _bind_cost(command)
        k = candidates.shape[0]
        qp0 = jnp.tile(state.qpos[:, None], (1, k))
        qv0 = jnp.tile(state.qvel[:, None], (1, k))
        dt_tick = float(rollout_model.timestep) * config.n_substeps
        plane = _local_plane(state, k) if terrain is not None else None
        pl = (jnp.full((1, k), payload, jnp.float32)
              if with_payload else None)

        def tick(carry, ctrl):  # ctrl (k, nu)
            qp, qv, prev_ctrl, t, disc = carry
            if with_payload:
                qp2, qv2 = psub(qp, qv, ctrl.T, plane, pl)
            elif terrain is not None:
                qp2, qv2 = psub(qp, qv, ctrl.T, plane)
            else:
                qp2, qv2 = psub(qp, qv, ctrl.T)
            t2 = t + dt_tick
            st = State(qpos=qp2.T, qvel=qv2.T,
                       time=jnp.full((k,), t2, jnp.float32))
            c = jax.vmap(cost_fn, in_axes=(0, 0, 0))(st, ctrl, prev_ctrl) \
                * disc
            return (qp2, qv2, ctrl, t2, disc * config.gamma), c

        (qpf, qvf, _, tf, _), costs = jax.lax.scan(
            tick,
            (qp0, qv0, candidates[:, 0], state.time, jnp.float32(1.0)),
            candidates.swapaxes(0, 1),
        )
        total = jnp.sum(costs, axis=0)  # (k,)
        if terminal_cost is not None:
            final = State(qpos=qpf.T, qvel=qvf.T,
                          time=jnp.full((k,), tf, jnp.float32))
            total = total + jax.vmap(terminal_cost)(final)
        return total

    def _sample_candidates(nominal: jax.Array, keys: jax.Array) -> jax.Array:
        """(k, H, nu) clipped candidate plans, one per-sample PRNG key.
        Colored (low-pass) exploration noise keeps the position servos
        from chattering — the smoothing scans along the horizon."""

        def one(k):
            e = (jax.random.normal(k, (H, nu), dtype=jnp.float32)
                 * config.noise_sigma)

            def smooth(carry, x):
                c = config.smooth_alpha * carry + (1 - config.smooth_alpha) * x
                return c, c

            return jax.lax.scan(smooth, jnp.zeros(nu), e)[1]

        eps = jax.vmap(one)(keys)
        return jnp.clip(nominal[None] + eps, lo, hi)

    def _rollout_costs(state: State, candidates: jax.Array,
                       payload=None, command=None,
                       ref_seq=None) -> jax.Array:
        if config.engine == "pallas":
            costs = rollout_costs_pallas(state, candidates, payload,
                                         command)
        else:
            costs = jax.vmap(rollout_cost, in_axes=(None, 0, None))(
                state, candidates, command)
        if anchored:
            costs = costs + anchor_w * jnp.sum(
                jnp.square(candidates - ref_seq[None]), axis=(1, 2))
        # diverged candidate rollouts (coarse planning dt) must not poison
        # the softmax: treat non-finite costs as very bad, not NaN
        return jnp.where(jnp.isfinite(costs), costs, 1e9)

    def _weighted_update(candidates, costs, axis_name=None):
        """Softmax-weighted nominal update; with ``axis_name`` the weights
        and weighted sums reduce over the sample-sharded mesh axis (the ICI
        collective path of the solver)."""
        beta = jnp.min(costs)
        if axis_name is not None:
            beta = jax.lax.pmin(beta, axis_name)
        w_un = jnp.exp(-(costs - beta) / config.temperature)
        denom = jnp.sum(w_un)
        new_nominal = jnp.einsum("k,khu->hu", w_un, candidates)
        sum_cost = jnp.sum(costs)
        sum_w2_un = jnp.sum(jnp.square(w_un))
        if axis_name is not None:
            denom, new_nominal, sum_cost, sum_w2_un = (
                jax.lax.psum(denom, axis_name),
                jax.lax.psum(new_nominal, axis_name),
                jax.lax.psum(sum_cost, axis_name),
                jax.lax.psum(sum_w2_un, axis_name),
            )
        new_nominal = new_nominal / denom
        stats = dict(
            best_cost=beta,
            mean_cost=sum_cost / K,
            # effective sample size of the normalised weights
            ess=jnp.square(denom) / sum_w2_un,
        )
        return new_nominal, stats

    def solve(state: State, mppi: MPPIState, key: jax.Array,
              *aux):
        if with_payload or with_command:
            expect = int(with_payload) + int(with_command)
            assert len(aux) == expect, (
                f"solver built with_payload={with_payload}, "
                f"with_command={with_command}: expected {expect} trailing "
                f"args (payload first), got {len(aux)}")
        payload = aux[0] if with_payload else None
        command = aux[-1] if with_command else None
        keys = jax.random.split(key, K)
        ref_seq = _ref_seq(state, command) if anchored else None

        if mesh is None:
            candidates = _sample_candidates(mppi.nominal, keys)
            costs = _rollout_costs(state, candidates, payload, command,
                                   ref_seq)
            new_nominal, stats = _weighted_update(candidates, costs)
        else:
            def shard_fn(st, nominal, keys_local, pl, cmd, ref):
                cand = _sample_candidates(nominal, keys_local)
                costs = _rollout_costs(
                    st, cand,
                    pl if with_payload else None,
                    cmd if with_command else None,
                    ref if anchored else None)
                return _weighted_update(cand, costs, axis_name=sample_axis)

            pl_in = (jnp.float32(payload) if with_payload
                     else jnp.float32(0.0))
            cmd_in = (jnp.asarray(command, jnp.float32) if with_command
                      else jnp.zeros(1, jnp.float32))
            ref_in = (ref_seq if anchored
                      else jnp.zeros((H, nu), jnp.float32))
            new_nominal, stats = shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(), P(), P(sample_axis), P(), P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )(state, mppi.nominal, keys, pl_in, cmd_in, ref_in)

        ctrl = new_nominal[0]
        # receding horizon: shift, repeat last
        shifted = jnp.concatenate([new_nominal[1:], new_nominal[-1:]], axis=0)
        return ctrl, MPPIState(nominal=shifted), stats

    return solve

"""iLQR / DDP — the shooting branch of the MPC engine (BASELINE.json
config 3: whole-body MPC with a 1 s horizon, 1 Hz replan + 50 Hz tracking).

TPU-first structure:
  * dynamics linearisations A_t, B_t for the whole horizon come from one
    ``vmap(jacfwd)`` over the rollout — H independent Jacobians batch onto
    the MXU instead of a sequential AD sweep;
  * the backward Riccati recursion is available in two modes:
      - ``"scan"``         — classic sequential ``lax.scan`` (O(H) depth);
      - ``"associative"``  — parallel-in-time value-function composition via
        ``jax.lax.associative_scan`` (O(log H) depth).  This is the
        sequence/context-parallel axis of this framework (SURVEY §2.8 SP/CP
        row): long horizons shard over devices exactly like ring-attention
        shards sequence length.
  * the forward pass line-search evaluates all step sizes in parallel with
    ``vmap`` and picks the best.

State convention: x = [qpos; qvel] treated as Euclidean for linearisation
(the free-joint quaternion is renormalised inside the dynamics, which keeps
the local linearisation valid for the small per-step rotations of a 50 Hz
loop).  Stage TIME is threaded through the horizon as a per-stage constant
(t0 + k*stage_dt, never differentiated), so phase-indexed costs — gait
references and explicit contact schedules (``costs.ContactSchedule``) —
bind the correct phase at every horizon step; this is what lets one solve
optimise through a full stance/swing sequence (BASELINE config 3, "iLQR
MPC with contact schedule").
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..physics import State, Terrain, dynamics


def _vf_combine(earlier, later):
    """Associative composition of two value-function blocks
    (F, c, C, eta, J).  Batch-safe: every operand may carry leading batch
    axes (``associative_scan`` combines whole blocks at once) and the two
    sides broadcast against each other."""
    F1, c1, C1, n1, J1 = earlier
    F2, c2, C2, n2, J2 = later
    nx = F1.shape[-1]
    I = jnp.eye(nx)
    mT = lambda M: jnp.swapaxes(M, -1, -2)
    mv = lambda M, v: jnp.einsum("...ij,...j->...i", M, v)
    A1 = I + C1 @ J2  # (..., nx, nx)
    A2 = I + J2 @ C1
    X = jnp.linalg.solve(A1, F1)
    Y = jnp.linalg.solve(A1, C1)
    Z = jnp.linalg.solve(A2, J2)
    F12 = F2 @ X
    c12 = mv(F2, jnp.linalg.solve(A1, (c1 + mv(C1, n2))[..., None])[..., 0]) + c2
    C12 = F2 @ Y @ mT(F2) + C2
    n12 = mv(mT(F1), jnp.linalg.solve(A2, (n2 - mv(J2, c1))[..., None])[..., 0]) + n1
    J12 = mT(F1) @ Z @ F1 + J1
    return (F12, c12, C12, n12, J12)


def _vf_identity(nx):
    """Identity element of ``_vf_combine``: combine(e, id) == e and
    combine(id, l) == l (F=I, everything else zero)."""
    return (jnp.eye(nx), jnp.zeros(nx), jnp.zeros((nx, nx)),
            jnp.zeros(nx), jnp.zeros((nx, nx)))


def _suffix_scan(elems):
    """Reverse (suffix) associative scan of value-function blocks.
    reverse=True internally flips the sequence and runs a forward scan, so
    the callback's first argument is the *later-in-time* block: swap roles
    so the earlier element stays the outer operator."""
    return jax.lax.associative_scan(
        lambda a, b: _vf_combine(b, a), elems, reverse=True
    )


def sharded_suffix_scan(elems, mesh: Mesh, axis_name: str = "sp"):
    """Horizon-sharded reverse associative scan — the sequence/context-
    parallel axis of the MPC engine (SURVEY §2.8 SP/CP row).

    Classic two-level blocked scan over a device mesh: each device runs the
    suffix scan on its local horizon block, block totals are exchanged with
    one tiny ``all_gather`` over ICI, the cross-block suffix aggregates are
    composed redundantly on every device (n_blocks elements — negligible),
    and each local prefix is finished with one extra combine.  Equivalent
    to the single-device scan up to fp reduction order
    (tests/test_sharded_solvers.py)."""
    n = int(mesh.shape[axis_name])
    L = elems[0].shape[0]
    nx = elems[0].shape[-1]
    pad = (-L) % n
    if pad:
        ident = _vf_identity(nx)
        elems = tuple(
            jnp.concatenate([e, jnp.broadcast_to(i, (pad,) + i.shape)], 0)
            for e, i in zip(elems, ident)
        )

    def shard_fn(local):
        local_comp = _suffix_scan(local)
        totals = tuple(t[:1] for t in local_comp)  # this block's product
        gathered = jax.lax.all_gather(totals, axis_name, axis=0, tiled=True)
        ident = _vf_identity(nx)
        ext = tuple(
            jnp.concatenate([g, i[None]], 0) for g, i in zip(gathered, ident)
        )
        agg_incl = _suffix_scan(ext)  # (n+1, ...), last = identity
        idx = jax.lax.axis_index(axis_name)
        # exclusive suffix for this block: product of all LATER blocks
        agg = tuple(
            jax.lax.dynamic_index_in_dim(a, idx + 1, 0, keepdims=False)
            for a in agg_incl
        )
        return _vf_combine(local_comp, agg)

    comp = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name),), out_specs=P(axis_name),
        check_vma=False,
    )(elems)
    if pad:
        comp = tuple(c[:L] for c in comp)
    return comp


def associative_lqr_gains(A, B, lx, lu, lxx, luu, lux, vx, vxx, reg,
                          mesh: Optional[Mesh] = None,
                          horizon_axis: str = "sp"):
    """O(log H)-depth LQR backward pass via associative value-function
    composition (see ``make_ilqr`` docstring).  Standalone so it can be
    validated against the sequential recursion and reused by other solvers.
    With ``mesh`` given the horizon axis is sharded over devices
    (``sharded_suffix_scan``).

    Returns (k (H, nu), K (H, nu, nx), dV (H,))."""
    H, nx = A.shape[0], A.shape[1]
    nu = B.shape[2]
    eye_u = jnp.eye(nu)
    R = luu + reg * eye_u[None]
    Rinv = jax.vmap(jnp.linalg.inv)(R)
    RinvM = jnp.einsum("huv,hvx->hux", Rinv, lux)
    Rinvr = jnp.einsum("huv,hv->hu", Rinv, lu)
    F = A - jnp.einsum("hxu,huy->hxy", B, RinvM)
    c = -jnp.einsum("hxu,hu->hx", B, Rinvr)
    C = jnp.einsum("hxu,huv,hyv->hxy", B, Rinv, B)
    J = lxx - jnp.einsum("hux,huy->hxy", lux, RinvM)
    eta = -(lx - jnp.einsum("hux,hu->hx", lux, Rinvr))

    zf = jnp.zeros((1, nx, nx))
    F_all = jnp.concatenate([F, zf], axis=0)
    c_all = jnp.concatenate([c, jnp.zeros((1, nx))], axis=0)
    C_all = jnp.concatenate([C, zf], axis=0)
    eta_all = jnp.concatenate([eta, -vx[None]], axis=0)
    J_all = jnp.concatenate([J, vxx[None]], axis=0)

    elems = (F_all, c_all, C_all, eta_all, J_all)
    if mesh is None:
        comp = _suffix_scan(elems)
    else:
        comp = sharded_suffix_scan(elems, mesh, horizon_axis)
    Vxx_next = comp[4][1:]
    Vx_next = -comp[3][1:]

    def gains(inp):
        A_t, B_t, lu_t, luu_t, lux_t, Vx_n, Vxx_n = inp
        Qu = lu_t + B_t.T @ Vx_n
        Quu = luu_t + B_t.T @ Vxx_n @ B_t + reg * eye_u
        Qux = lux_t + B_t.T @ Vxx_n @ A_t
        L = jax.scipy.linalg.cho_factor(Quu, lower=True)
        k = -jax.scipy.linalg.cho_solve(L, Qu)
        K = -jax.scipy.linalg.cho_solve(L, Qux)
        dV = k @ Qu + 0.5 * k @ (Quu @ k)
        return k, K, dV

    k, K, dV = jax.vmap(gains)((A, B, lu, luu, lux, Vx_next, Vxx_next))
    return k, K, dV


class ILQRConfig(NamedTuple):
    horizon: int = 50            # control steps
    n_substeps: int = 4
    rollout_dt: float = 0.005
    iterations: int = 10
    reg_init: float = 1e-3       # Levenberg-Marquardt regularisation
    reg_factor: float = 10.0
    reg_max: float = 1e6
    line_search_alphas: tuple = (1.0, 0.5, 0.25, 0.1, 0.03)
    riccati: str = "scan"        # "scan" | "associative"
    u_cost_reg: float = 1e-3     # quadratic control regularisation added
    # Matmul precision for the rollout dynamics.  TPU default-precision MXU
    # matmuls cost ~7e-3 qvel error/substep on the op-graph path (measured,
    # CLAUDE.md); "highest" forces full-f32 accumulation in the tiny
    # einsums of dynamics.step at a modest speed cost for these shapes.
    precision: str = "highest"


def make_ilqr(
    model,
    step_cost: Callable,  # (qpos, qvel, ctrl, prev_ctrl) -> scalar
    config: ILQRConfig = ILQRConfig(),
    terminal_cost: Optional[Callable] = None,
    terrain: Optional[Terrain] = None,
    mesh: Optional[Mesh] = None,
    horizon_axis: str = "sp",
):
    """Build ``solve(state, U_init) -> (U*, X*, stats)`` (jittable).
    ``stats`` includes the final feedback gains ``k_ff``/``K_fb`` along the
    returned trajectory (free when unused — XLA dead-code-eliminates them).
    ``mesh`` shards the associative Riccati sweep over the horizon axis
    (requires ``riccati='associative'``)."""
    nq, nv, nu = model.nq, model.nv, model.nu
    nx = nq + nv
    rollout_model = (
        model.replace(timestep=config.rollout_dt) if config.rollout_dt else model
    )
    lo = np.asarray(model.actuator_ctrlrange)[:, 0]
    hi = np.asarray(model.actuator_ctrlrange)[:, 1]
    if mesh is not None:
        assert config.riccati == "associative", (
            "horizon sharding requires the associative Riccati sweep")

    def pack(qpos, qvel):
        return jnp.concatenate([qpos, qvel])

    def unpack(x):
        return x[:nq], x[nq:]

    # each f() advances one control stage of the rollout model
    stage_dt = float(config.n_substeps) * float(
        config.rollout_dt if config.rollout_dt else model.timestep)

    def f(x, u):
        qpos, qvel = unpack(x)
        st = State(qpos=qpos, qvel=qvel, time=jnp.zeros(()))
        with jax.default_matmul_precision(config.precision):
            st2, _ = dynamics.step(
                rollout_model, st, u, terrain, n_substeps=config.n_substeps
            )
        return pack(st2.qpos, st2.qvel)

    def _as_state(x, t):
        qpos, qvel = unpack(x)
        # iLQR linearises over [qpos; qvel] only; time is threaded through
        # as a per-stage CONSTANT (t0 + k*stage_dt), so phase-indexed costs
        # (gait references, contact schedules) see the right phase at every
        # horizon step without being differentiated through
        return State(qpos=qpos, qvel=qvel, time=t)

    def stage_cost(x, u, u_prev, t):
        return step_cost(_as_state(x, t), u, u_prev) \
            + config.u_cost_reg * jnp.sum(jnp.square(u))

    def term_cost(x, t):
        if terminal_cost is not None:
            return terminal_cost(_as_state(x, t))
        return step_cost(_as_state(x, t), jnp.zeros(nu), jnp.zeros(nu))

    def rollout(x0, U):
        def tick(x, u):
            xn = f(x, u)
            return xn, xn

        _, X1 = jax.lax.scan(tick, x0, U)
        return jnp.concatenate([x0[None], X1], axis=0)  # (H+1, nx)

    def total_cost(X, U, times):
        Uprev = jnp.concatenate([U[:1], U[:-1]], axis=0)
        cs = jax.vmap(stage_cost)(X[:-1], U, Uprev, times[:-1])
        return jnp.sum(cs) + term_cost(X[-1], times[-1])

    # ---------------- derivatives (batched over the horizon) -------------
    dfdx = jax.vmap(jax.jacfwd(f, argnums=0))
    dfdu = jax.vmap(jax.jacfwd(f, argnums=1))

    def cost_expansion(X, U, times):
        Uprev = jnp.concatenate([U[:1], U[:-1]], axis=0)
        args = (X[:-1], U, Uprev, times[:-1])
        lx = jax.vmap(jax.grad(stage_cost, argnums=0))(*args)
        lu = jax.vmap(jax.grad(stage_cost, argnums=1))(*args)
        lxx = jax.vmap(jax.hessian(stage_cost, argnums=0))(*args)
        luu = jax.vmap(jax.hessian(stage_cost, argnums=1))(*args)
        lux = jax.vmap(
            jax.jacfwd(jax.grad(stage_cost, argnums=1), argnums=0)
        )(*args)
        vx = jax.grad(term_cost)(X[-1], times[-1])
        vxx = jax.hessian(term_cost)(X[-1], times[-1])
        return lx, lu, lxx, luu, lux, vx, vxx

    # ---------------- backward passes ------------------------------------
    def backward_scan(A, B, lx, lu, lxx, luu, lux, vx, vxx, reg):
        def bstep(carry, inp):
            Vx, Vxx = carry
            A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
            Qx = lx_t + A_t.T @ Vx
            Qu = lu_t + B_t.T @ Vx
            Qxx = lxx_t + A_t.T @ Vxx @ A_t
            Quu = luu_t + B_t.T @ Vxx @ B_t
            Qux = lux_t + B_t.T @ Vxx @ A_t
            Quu_reg = Quu + reg * jnp.eye(nu)
            L = jax.scipy.linalg.cho_factor(Quu_reg, lower=True)
            k = -jax.scipy.linalg.cho_solve(L, Qu)
            K = -jax.scipy.linalg.cho_solve(L, Qux)
            Vx_new = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx_new = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
            dV = k @ Qu + 0.5 * k @ (Quu @ k)
            return (Vx_new, Vxx_new), (k, K, dV)

        (_, _), (k, K, dV) = jax.lax.scan(
            bstep, (vx, vxx), (A, B, lx, lu, lxx, luu, lux), reverse=True
        )
        return k, K, jnp.sum(dV)

    def backward_associative(A, B, lx, lu, lxx, luu, lux, vx, vxx, reg):
        k, K, dV = associative_lqr_gains(
            A, B, lx, lu, lxx, luu, lux, vx, vxx, reg,
            mesh=mesh, horizon_axis=horizon_axis,
        )
        return k, K, jnp.sum(dV)

    # ---------------- forward pass with parallel line search --------------
    def forward(x0, X, U, k, K, alpha):
        def tick(carry, inp):
            x = carry
            X_t, U_t, k_t, K_t = inp
            u = U_t + alpha * k_t + K_t @ (x - X_t)
            u = jnp.clip(u, lo, hi)
            xn = f(x, u)
            return xn, (xn, u)

        _, (X1, Unew) = jax.lax.scan(tick, x0, (X[:-1], U, k, K))
        Xnew = jnp.concatenate([x0[None], X1], axis=0)
        return Xnew, Unew

    backward = (
        backward_associative
        if config.riccati == "associative"
        else backward_scan
    )

    def _solve(state: State, U_init: jax.Array):
        x0 = pack(state.qpos, state.qvel)
        # stage times along the horizon: phase-indexed costs bind here
        times = state.time + stage_dt * jnp.arange(
            config.horizon + 1, dtype=jnp.float32)

        def iteration(carry, _):
            U, cost, reg = carry
            X = rollout(x0, U)
            A = dfdx(X[:-1], U)
            B = dfdu(X[:-1], U)
            lx, lu, lxx, luu, lux, vx, vxx = cost_expansion(X, U, times)
            k, K, dV = backward(A, B, lx, lu, lxx, luu, lux, vx, vxx, reg)

            alphas = jnp.asarray(config.line_search_alphas)
            Xc, Uc = jax.vmap(lambda a: forward(x0, X, U, k, K, a))(alphas)
            costs = jax.vmap(lambda Xa, Ua: total_cost(Xa, Ua, times))(Xc, Uc)
            best = jnp.argmin(costs)
            improved = costs[best] < cost
            U_next = jnp.where(improved, Uc[best], U)
            cost_next = jnp.where(improved, costs[best], cost)
            reg_next = jnp.where(
                improved,
                jnp.maximum(reg / config.reg_factor, 1e-9),
                jnp.minimum(reg * config.reg_factor, config.reg_max),
            )
            return (U_next, cost_next, reg_next), cost_next

        U0 = U_init
        cost0 = total_cost(rollout(x0, U0), U0, times)
        (U, cost, _), cost_trace = jax.lax.scan(
            iteration, (U0, cost0, jnp.float32(config.reg_init)),
            None, length=config.iterations,
        )
        X = rollout(x0, U)
        # final time-varying LQR gains along (X, U): one extra backward
        # pass at the converged plan.  Used by the replan+track MPC cycle
        # (mpc.make_ilqr_tracker); XLA eliminates it when stats['K_fb'] is
        # unused by the caller.
        A = dfdx(X[:-1], U)
        B = dfdu(X[:-1], U)
        lx, lu, lxx, luu, lux, vx, vxx = cost_expansion(X, U, times)
        k_ff, K_fb, _ = backward(
            A, B, lx, lu, lxx, luu, lux, vx, vxx,
            jnp.float32(config.reg_init),
        )
        return U, X, dict(cost=cost, initial_cost=cost0,
                          cost_trace=cost_trace, k_ff=k_ff, K_fb=K_fb)

    def solve(state: State, U_init: jax.Array):
        # ALL solver linear algebra under the configured precision, not
        # just the dynamics einsums: the Riccati recursion's nx x nx
        # products (A^T Vxx A, ...) accumulate over the horizon, and
        # default MXU rounding there is enough to push a marginally
        # damped gait onto a diverging trajectory (bench config 3b walked
        # healthy on CPU f32 but belly-flopped mid-run on TPU with only
        # the dynamics guarded)
        with jax.default_matmul_precision(config.precision):
            return _solve(state, U_init)

    return solve

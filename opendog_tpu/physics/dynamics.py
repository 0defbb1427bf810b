"""Featherstone dynamics in base-centered world coordinates (pure JAX).

Everything here is written for a *single* state and batched by ``jax.vmap`` —
the loops over bodies/dofs are over *static* tree metadata and unroll at trace
time into straight-line XLA ops over the batch, which is the layout the TPU
wants (wide ``(batch, ...)`` elementwise ops + small matmuls that XLA fuses).

Spatial quantities use the common-origin convention of
:mod:`opendog_tpu.physics.spatial`: the reference origin is the floating-base
position at the start of the step, so positions entering the algorithms stay
O(robot size) and the mass matrix remains well conditioned in float32.

Replaces the MuJoCo pipeline the reference drives through ``mj_step``
(reference call sites: ``Code/mujoco/sim2real/train.py:281``,
``environments/WalkEnvironment.py:58``):
  * CRBA mass matrix + RNEA bias instead of MuJoCo's sparse factorisation;
  * smooth penalty contact (spring-damper normal + regularised Coulomb
    friction) instead of the elliptic-cone constraint solver — calibrated to
    the near-rigid impratio=100 behaviour of the reference models;
  * explicit position-servo actuators (kp/kv/forcerange,
    our_robot.xml:11 / go1.xml:10-21);
  * semi-implicit Euler with exact quaternion integration.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import spatial
from .model import (
    JNT_FREE,
    JNT_HINGE,
    Contact,
    Model,
    State,
    StepInfo,
    Terrain,
)

# ---------------------------------------------------------------------------
# Static topology helpers (numpy, evaluated at trace time)
# ---------------------------------------------------------------------------


def _body_ancestor_matrix(model: Model) -> np.ndarray:
    """A[b, i] = 1 if body i is an ancestor of (or equals) body b."""
    nb = model.nbody
    A = np.zeros((nb, nb), dtype=np.float32)
    for b in range(nb):
        j = b
        while j >= 0:
            A[b, j] = 1.0
            j = model.body_parent[j]
    return A


def _dof_ancestors(model: Model):
    """Static per-dof ancestor dof lists (strictly above, excluding self),
    ordered ascending.  Two dofs couple in the mass matrix iff one is an
    ancestor of the other — the branch-induced sparsity that makes the
    tree-sparse LTDL solve O(depth) instead of O(nv^3)."""
    A = _body_ancestor_matrix(model)
    anc = []
    for j in range(model.nv):
        bj = model.dof_body[j]
        lst = [
            i for i in range(model.nv)
            if i != j and A[bj, model.dof_body[i]] and (
                model.dof_body[i] != bj or i < j
            )
        ]
        anc.append([i for i in lst if i < j])
    return anc


def tree_solve(model: Model, A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b exploiting branch-induced sparsity (MuJoCo's
    mj_factorM/mj_solveM equivalent, unrolled over the static tree).

    A must carry the tree sparsity pattern: A[i, j] == 0 unless dof i and j
    lie on one root path.  For a quadruped this turns the dense (nv, nv)
    Cholesky — the dominant cost of the batched substep on TPU — into
    ~nv small scalar-vector ops.

    LTDL factorization A = L' D L with unit-lower-triangular L sharing A's
    sparsity; processed leaf-to-root (Featherstone ch. 8).
    """
    anc = _dof_ancestors(model)
    nv = model.nv
    # work on a dict of scalar entries to keep everything registers/vectors
    H = {}
    for j in range(nv):
        for i in anc[j] + [j]:
            H[(j, i)] = A[..., j, i]
    # factorize: for k = nv-1..0: for i in anc(k): ...
    for k in reversed(range(nv)):
        dk = H[(k, k)]
        for i in reversed(anc[k]):
            a = H[(k, i)] / dk
            for j in anc[k]:
                if j <= i:
                    H[(i, j)] = H.get((i, j), 0.0) - a * H[(k, j)]
            H[(k, i)] = a
    # solve L' D L x = b:  z = L'^-T b is leaf-to-root... standard order:
    # x = L^-1 (D^-1 (L^-T b))
    x = [b[..., j] for j in range(nv)]
    # x <- L^-T x : for k = nv-1..0: for i in anc(k): x_i -= L[k,i] x_k
    for k in reversed(range(nv)):
        for i in anc[k]:
            x[i] = x[i] - H[(k, i)] * x[k]
    # x <- D^-1 x
    for k in range(nv):
        x[k] = x[k] / H[(k, k)]
    # x <- L^-1 x : for k = 0..nv-1: x_k -= sum_i L[k,i] x_i
    for k in range(nv):
        for i in anc[k]:
            x[k] = x[k] - H[(k, i)] * x[i]
    return jnp.stack(x, axis=-1)


def _arrow_structure(model: Model):
    """Detect the quadruped block-arrow sparsity: a floating base (6 dofs)
    plus G independent serial chains of equal length hanging off it.
    Returns (base_dofs, chains (G, n) numpy) or None."""
    if model.nbody == 0 or model.jnt_type[0] != JNT_FREE:
        return None
    base = list(range(6))
    A = _body_ancestor_matrix(model)
    # group non-base dofs by their root-child subtree
    groups = {}
    for j in range(6, model.nv):
        b = model.dof_body[j]
        # walk up to the child-of-base body
        while model.body_parent[b] != 0:
            b = model.body_parent[b]
            if b < 0:
                return None
        groups.setdefault(b, []).append(j)
    chains = list(groups.values())
    if not chains:
        return None
    n = len(chains[0])
    if any(len(c) != n for c in chains):
        return None
    # chains must be serial (each dof's body on one path) — guaranteed by
    # construction of groups for our models; verify coupling denseness
    return np.array(base), np.array(chains)


def arrow_solve(model: Model, A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched solve of the implicit-dynamics system exploiting the
    quadruped's block-arrow sparsity: legs only couple through the floating
    base, so the dense (nv, nv) Cholesky — the dominant TPU cost of the
    substep (measured ~60%) — reduces to G small leg factorizations + one
    6x6 Schur solve, all as wide batched tensor ops.

    A: (..., nv, nv) with the tree sparsity; b: (..., nv)."""
    structure = _arrow_structure(model)
    if structure is None:
        L = jax.scipy.linalg.cho_factor(A, lower=True)
        return jax.scipy.linalg.cho_solve(L, b)
    base, chains = structure
    G, n = chains.shape
    batch = A.shape[:-2]

    Abb = A[..., base[:, None], base[None, :]]               # (...,6,6)
    Abl = A[..., base[:, None, None], chains[None, :, :]]    # (...,6,G,n)
    All = A[..., chains[:, :, None], chains[:, None, :]]     # (...,G,n,n)
    bl = b[..., chains]                                      # (...,G,n)
    bb = b[..., base]                                        # (...,6)

    # inverse of the (n, n) leg blocks, closed form for n <= 3
    if n == 1:
        All_inv = 1.0 / All
    elif n == 2:
        a_ = All[..., 0, 0]; b_ = All[..., 0, 1]
        c_ = All[..., 1, 0]; d_ = All[..., 1, 1]
        det = a_ * d_ - b_ * c_
        det = jnp.where(jnp.abs(det) < 1e-12,
                        jnp.where(det < 0, -1e-12, 1e-12), det)
        All_inv = jnp.stack([
            jnp.stack([d_, -b_], axis=-1),
            jnp.stack([-c_, a_], axis=-1),
        ], axis=-2) / det[..., None, None]
    elif n == 3:
        m = All
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        det = (m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02)
        det = jnp.where(jnp.abs(det) < 1e-12,
                        jnp.where(det < 0, -1e-12, 1e-12), det)
        All_inv = jnp.stack([
            jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1),
        ], axis=-2) / det[..., None, None]
    else:
        L = jax.scipy.linalg.cho_factor(A, lower=True)
        return jax.scipy.linalg.cho_solve(L, b)

    # Schur complement on the base: S = Abb - sum_g Abl inv(All) Alb
    AblInv = jnp.einsum("...igm,...gmn->...ign", Abl, All_inv)  # (...,6,G,n)
    S = Abb - jnp.einsum("...ign,...jgn->...ij", AblInv, Abl)
    yb = bb - jnp.einsum("...ign,...gn->...i", AblInv, bl)

    # 6x6 SPD solve via unrolled Cholesky (static, ~18 fused vector ops)
    xb = _chol_solve_unrolled(S, yb)

    # back-substitute legs: x_l = inv(All) (b_l - Alb x_b)
    rhs = bl - jnp.einsum("...ign,...i->...gn", Abl, xb)
    xl = jnp.einsum("...gmn,...gn->...gm", All_inv, rhs)

    x = jnp.zeros_like(b)
    x = x.at[..., base].set(xb)
    x = x.at[..., chains].set(xl)
    return x


def _chol_solve_unrolled(S: jax.Array, y: jax.Array) -> jax.Array:
    """Unrolled Cholesky solve for small fixed m = S.shape[-1] (static)."""
    m = S.shape[-1]
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        s = S[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        # f32 cancellation in extreme (already-fallen) states can push the
        # pivot slightly negative; clamp instead of emitting NaN
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-9))
        for i in range(j + 1, m):
            s = S[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s / L[j][j]
    # forward solve L z = y
    z = [None] * m
    for i in range(m):
        s = y[..., i]
        for k in range(i):
            s = s - L[i][k] * z[k]
        z[i] = s / L[i][i]
    # back solve L^T x = z
    x = [None] * m
    for i in reversed(range(m)):
        s = z[i]
        for k in range(i + 1, m):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _dof_ancestor_matrix(model: Model) -> np.ndarray:
    """D[i, j] = 1 if dof i belongs to an ancestor-or-self joint of dof j's
    body (i.e. M[i, j] is structurally nonzero with i above j)."""
    A = _body_ancestor_matrix(model)
    nv = model.nv
    D = np.zeros((nv, nv), dtype=np.float32)
    for j in range(nv):
        bj = model.dof_body[j]
        for i in range(nv):
            bi = model.dof_body[i]
            if A[bj, bi]:
                # Same-body pairs (e.g. the free joint's 6x6 block) are
                # "ancestor" in both directions; keep only the upper
                # triangle so the symmetrizing Wm + Wm.T in mass_matrix
                # doesn't double-count them (verified vs mujoco.mj_fullM).
                if bi == bj and i > j:
                    continue
                D[i, j] = 1.0
    return D


# ---------------------------------------------------------------------------
# Kinematics
# ---------------------------------------------------------------------------


def _tree_levels(model: Model):
    """Static list of numpy body-index arrays grouped by tree depth.
    Kinematic propagation runs one *batched* op-set per level instead of one
    per body — the op-count (and TPU kernel-launch) win that makes the MPC
    rollout fast: 4 levels instead of 13 sequential bodies for a quadruped."""
    depth = {}
    for i in range(model.nbody):
        p = model.body_parent[i]
        depth[i] = 0 if p < 0 else depth[p] + 1
    nlev = max(depth.values()) + 1
    return [
        np.array([i for i in range(model.nbody) if depth[i] == L],
                 dtype=np.int32)
        for L in range(nlev)
    ]


def _level_perm(model: Model):
    """(levels, inverse permutation) mapping level-major concat -> body order."""
    levels = _tree_levels(model)
    order = np.concatenate(levels)
    inv = np.argsort(order)
    return levels, inv


def fk(model: Model, qpos: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Forward kinematics: world body positions (nb,3) and quaternions (nb,4).

    Level-parallel and scatter-free: each tree depth is one batched op-set
    (parents gathered from the previous level's array), assembled at the end
    with a single concat + static-permutation gather."""
    levels, inv = _level_perm(model)
    pos_levels, quat_levels = [], []
    for L, idx in enumerate(levels):
        free_mask = np.array([model.jnt_type[i] == JNT_FREE for i in idx])
        if free_mask.all():
            adr = np.array([model.body_qpos_adr[i] for i in idx])
            p = jnp.stack([qpos[a : a + 3] for a in adr])
            q = spatial.quat_normalize(
                jnp.stack([qpos[a + 3 : a + 7] for a in adr])
            )
        else:
            assert not free_mask.any(), "mixed free/hinge level unsupported"
            parents = np.array([model.body_parent[i] for i in idx])
            if parents[0] < 0:  # hinge bodies welded at the world root
                pp = jnp.zeros((len(idx), 3), dtype=qpos.dtype)
                pq = jnp.broadcast_to(
                    spatial.quat_identity(qpos.dtype), (len(idx), 4)
                )
            else:
                prev = levels[L - 1]
                pos_in_prev = np.array(
                    [int(np.where(prev == p_)[0][0]) for p_ in parents]
                )
                pp = pos_levels[L - 1][pos_in_prev]
                pq = quat_levels[L - 1][pos_in_prev]
            p = pp + spatial.quat_rotate(pq, model.body_pos[idx])
            q = spatial.quat_mul(pq, model.body_quat[idx])
            hinge = np.array([model.jnt_type[i] == JNT_HINGE for i in idx])
            if hinge.any():
                adr = np.array([model.body_qpos_adr[i] for i in idx])
                theta = qpos[adr] * hinge
                qj = spatial.quat_from_axis_angle(
                    jnp.asarray(model.jnt_axis[idx]), theta
                )
                anchor = p + spatial.quat_rotate(q, model.jnt_pos[idx])
                q = spatial.quat_mul(q, qj)
                p = anchor - spatial.quat_rotate(q, model.jnt_pos[idx])
        pos_levels.append(p)
        quat_levels.append(q)
    xpos = jnp.concatenate(pos_levels)[inv]
    xquat = jnp.concatenate(quat_levels)[inv]
    return xpos, xquat


def motion_subspace(
    model: Model, xpos: jax.Array, xquat: jax.Array, origin: jax.Array
) -> jax.Array:
    """Per-dof spatial motion axes S (nv, 6) at the reference ``origin``.

    Free joint follows the MuJoCo convention: 3 translational dofs in world
    axes, then 3 rotational dofs as body-frame angular-velocity components
    (axes rotate with the body)."""
    dtype = xpos.dtype
    S = jnp.zeros((model.nv, 6), dtype=dtype)
    free_bodies = [i for i in range(model.nbody)
                   if model.jnt_type[i] == JNT_FREE]
    for i in free_bodies:
        d = model.body_dof_adr[i]
        R = spatial.quat_to_mat(xquat[i])
        p = xpos[i] - origin
        trans = jnp.concatenate(
            [jnp.zeros((3, 3), dtype), jnp.eye(3, dtype=dtype)], axis=1
        )
        rot = jnp.concatenate(
            [R.T, jnp.cross(jnp.broadcast_to(p, (3, 3)), R.T)], axis=1
        )
        S = S.at[d : d + 3].set(trans).at[d + 3 : d + 6].set(rot)
    hb = np.array([i for i in range(model.nbody)
                   if model.jnt_type[i] == JNT_HINGE], dtype=np.int32)
    if hb.size:
        dofs = np.array([model.body_dof_adr[i] for i in hb], dtype=np.int32)
        q = xquat[hb]
        a = spatial.quat_rotate(q, jnp.asarray(model.jnt_axis[hb]))
        anchor = xpos[hb] + spatial.quat_rotate(
            q, jnp.asarray(model.jnt_pos[hb])
        ) - origin
        S = S.at[dofs].set(
            jnp.concatenate([a, jnp.cross(anchor, a)], axis=-1)
        )
    return S


def body_velocities(model: Model, S: jax.Array, qvel: jax.Array) -> jax.Array:
    """Spatial velocity of every body at the reference origin: (nb, 6)."""
    return (model.ancestor_mask * qvel[None, :]) @ S


def site_positions(model: Model, xpos: jax.Array, xquat: jax.Array) -> jax.Array:
    """World positions of all sites (nsite, 3)."""
    if model.nsite == 0:
        return jnp.zeros((0, 3), dtype=xpos.dtype)
    out = []
    for s in range(model.nsite):
        b = model.site_body[s]
        out.append(xpos[b] + spatial.quat_rotate(xquat[b], model.site_pos[s]))
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# Inertia / bias
# ---------------------------------------------------------------------------


def _spatial_inertias(
    model: Model, xpos: jax.Array, xquat: jax.Array, origin: jax.Array
) -> jax.Array:
    """Per-body 6x6 spatial inertia about the reference origin: (nb, 6, 6)."""
    R = spatial.quat_to_mat(xquat)  # (nb,3,3)
    com = xpos + jnp.einsum("bij,bj->bi", R, model.body_com) - origin
    I_world = jnp.einsum("bij,bjk,blk->bil", R, model.body_inertia, R)
    return spatial.spatial_inertia_at_origin(model.body_mass, com, I_world)


def mass_matrix(model: Model, S: jax.Array, I_O: jax.Array) -> jax.Array:
    """CRBA in common-origin coordinates: M (nv, nv), armature included."""
    # NOTE: topology constants stay as *numpy* so they lower as XLA
    # literals — an eager jnp.asarray here would device_put through the
    # remote-TPU tunnel at every trace (observed 190 s lowering).
    A = _body_ancestor_matrix(model)  # (nb, nb) static numpy
    # composite subtree inertia for each body: IC_i = sum_b A[b,i] * I_O[b]
    IC = jnp.einsum("bi,bjk->ijk", A, I_O)  # (nb,6,6)
    # F_j = IC[body(j)] @ S_j
    dof_body = np.array(model.dof_body, dtype=np.int32)
    IC_dof = jnp.take(IC, dof_body, axis=0)  # (nv,6,6)
    F = jnp.einsum("jab,jb->ja", IC_dof, S)  # (nv,6)
    W = S @ F.T  # (nv,nv): W[i,j] = S_i . F_j
    Wm = W * _dof_ancestor_matrix(model)
    M = Wm + Wm.T - jnp.diag(jnp.diag(Wm))
    return M + jnp.diag(model.dof_armature)


def bias_forces(
    model: Model,
    S: jax.Array,
    V: jax.Array,
    I_O: jax.Array,
    qvel: jax.Array,
) -> jax.Array:
    """RNEA with zero acceleration: C(q, v) including gravity: (nv,)."""
    # per-body "joint velocity" contribution: vJ_i = sum(dofs of i) S q̇
    dof_sel = model.ancestor_mask  # (nb, nv)
    own_mask_np = np.zeros((model.nbody, model.nv), dtype=np.float32)
    for j in range(model.nv):
        own_mask_np[model.dof_body[j], j] = 1.0
    vJ = (own_mask_np * qvel[None, :]) @ S  # (nb,6)

    # accelerations: a_i = a_parent + v_i x vJ_i ; a_base_frame = [0; -g]
    # (level-parallel: one batched op-set per tree depth)
    g_acc = jnp.concatenate(
        [jnp.zeros(3, dtype=V.dtype), -jnp.asarray(model.gravity)]
    )
    levels, inv = _level_perm(model)
    a_levels = []
    for L, idx in enumerate(levels):
        parents = np.array([model.body_parent[i] for i in idx])
        if parents[0] < 0:  # root level
            a_p = jnp.broadcast_to(g_acc, (len(idx), 6))
        else:
            prev = levels[L - 1]
            pos_in_prev = np.array(
                [int(np.where(prev == p_)[0][0]) for p_ in parents]
            )
            a_p = a_levels[L - 1][pos_in_prev]
        a_levels.append(a_p + spatial.motion_cross(V[idx], vJ[idx]))
    a = jnp.concatenate(a_levels)[inv]

    f = jnp.einsum("bij,bj->bi", I_O, a) + spatial.force_cross(
        V, jnp.einsum("bij,bj->bi", I_O, V)
    )
    # subtree sums: f_sub_i = sum_b A[b,i] f_b ; C_j = S_j . f_sub[body(j)]
    A = _body_ancestor_matrix(model)
    f_sub = jnp.einsum("bi,bk->ik", A, f)  # (nb,6)
    dof_body = np.array(model.dof_body, dtype=np.int32)
    return jnp.einsum("jk,jk->j", S, jnp.take(f_sub, dof_body, axis=0))


# ---------------------------------------------------------------------------
# Forces: actuators, passive, contact
# ---------------------------------------------------------------------------


def actuator_forces(
    model: Model, qpos: jax.Array, qvel: jax.Array, ctrl: jax.Array
) -> jax.Array:
    """Position-servo torques scattered into dof space (nv,).

    tau = clip(kp (ctrl - q) - kv q̇, forcerange) — the MuJoCo position
    actuator the reference robots use (our_robot.xml:11, go1.xml:10)."""
    q = jnp.take(qpos, model.actuator_qposadr)
    qd = jnp.take(qvel, model.actuator_dof)
    tau = model.actuator_kp * (ctrl - q) - model.actuator_kv * qd
    tau = jnp.clip(
        tau, model.actuator_forcerange[:, 0], model.actuator_forcerange[:, 1]
    )
    return jnp.zeros_like(qvel).at[model.actuator_dof].add(tau)


def passive_terms(model: Model, qpos: jax.Array, qvel: jax.Array):
    """Soft joint-limit spring torques (explicit) + per-dof damping
    coefficients (implicit): returns (tau_spring (nv,), d_diag (nv,)).

    Damping folds joint damping, a Coulomb friction-loss linearisation
    (saturating at ``dof_frictionloss``), and extra limit damping when a
    limit is engaged."""
    qj = _dof_positions(model, qpos)
    lo, hi = model.dof_range[:, 0], model.dof_range[:, 1]
    below = jnp.maximum(lo - qj, 0.0)
    above = jnp.maximum(qj - hi, 0.0)
    k = model.limit_stiffness
    tau = model.dof_limited * k * (below - above)
    engaged = model.dof_limited * ((below > 0) | (above > 0))
    d_diag = (
        model.dof_damping
        + model.dof_frictionloss / jnp.maximum(jnp.abs(qvel), 0.05)
        + model.limit_damping * engaged
    )
    return tau, d_diag


def _dof_positions(model: Model, qpos: jax.Array) -> jax.Array:
    """Hinge angles aligned with dof indexing (free dofs get 0)."""
    hinge = [i for i in range(model.nbody) if model.jnt_type[i] == JNT_HINGE]
    dofs = np.array([model.body_dof_adr[i] for i in hinge], dtype=np.int32)
    adrs = np.array([model.body_qpos_adr[i] for i in hinge], dtype=np.int32)
    out = jnp.zeros(model.nv, dtype=qpos.dtype)
    if dofs.size:
        out = out.at[dofs].set(qpos[adrs])
    return out


def _terrain_height_normal(model: Model, terrain: Optional[Terrain], xy: jax.Array):
    """Ground height and unit normal under world xy points (batched over the
    leading axis of ``xy``)."""
    if terrain is None:
        h = jnp.zeros(xy.shape[:-1], dtype=xy.dtype)
        n = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], dtype=xy.dtype), xy.shape[:-1] + (3,)
        )
        return h, n
    nrow, ncol = terrain.height.shape
    sx, sy = model.hfield_size[0], model.hfield_size[1]
    # grid spans [-sx, sx] x [-sy, sy]; row ~ y, col ~ x (MuJoCo layout)
    fx = (xy[..., 0] + sx) / (2 * sx) * (ncol - 1)
    fy = (xy[..., 1] + sy) / (2 * sy) * (nrow - 1)
    fx = jnp.clip(fx, 0.0, ncol - 1.001)
    fy = jnp.clip(fy, 0.0, nrow - 1.001)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - x0
    ty = fy - y0
    h00 = terrain.height[y0, x0]
    h01 = terrain.height[y0, x0 + 1]
    h10 = terrain.height[y0 + 1, x0]
    h11 = terrain.height[y0 + 1, x0 + 1]
    h = (
        h00 * (1 - tx) * (1 - ty)
        + h01 * tx * (1 - ty)
        + h10 * (1 - tx) * ty
        + h11 * tx * ty
    )
    dx = ((h01 - h00) * (1 - ty) + (h11 - h10) * ty) / (2 * sx / (ncol - 1))
    dy = ((h10 - h00) * (1 - tx) + (h11 - h01) * tx) / (2 * sy / (nrow - 1))
    n = jnp.stack([-dx, -dy, jnp.ones_like(dx)], axis=-1)
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    return h, n


def geom_local_planes(model: Model, terrain: Optional[Terrain],
                      qpos: jax.Array) -> jax.Array:
    """(ngeom, 4) terrain tangent plane ``(nx, ny, nz, d)`` under each
    collision geom's current center (plane {x : n.x = d}, n unit).

    This feeds the fused kernel's ``with_plane="per_geom"`` mode: each paw
    contacts the terrain's local plane at ITS OWN xy instead of sharing
    the trunk's — the highest-fidelity terrain representation the fused
    kernel admits (planes are constant within a kernel invocation).
    Refreshed once per 50 Hz tick from the plant state it is accurate to
    the terrain's curvature over one tick of paw travel (~mm); the
    trajectory deviation vs exact bilinear contact is pinned in
    tests/test_pallas_core.py."""
    xpos, xquat = fk(model, qpos)
    R = spatial.quat_to_mat(xquat)
    gb = model.geom_body
    centers = jnp.take(xpos, gb, axis=0) + jnp.einsum(
        "gij,gj->gi", jnp.take(R, gb, axis=0), model.geom_pos
    )
    h, n = _terrain_height_normal(model, terrain, centers[:, :2])
    p0 = jnp.stack([centers[:, 0], centers[:, 1], h], axis=-1)
    d = jnp.sum(n * p0, axis=-1)
    return jnp.concatenate([n, d[:, None]], axis=-1)


def _contact_geometry(
    model: Model,
    xpos: jax.Array,
    xquat: jax.Array,
    terrain: Optional[Terrain],
):
    """Sphere-vs-(ground|static boxes) queries for every collision geom.

    Returns (penetration (ng,), normal (ng,3), contact point (ng,3), R (nb,3,3)).
    """
    R = spatial.quat_to_mat(xquat)  # (nb,3,3)
    gb = model.geom_body
    centers = jnp.take(xpos, gb, axis=0) + jnp.einsum(
        "gij,gj->gi", jnp.take(R, gb, axis=0), model.geom_pos
    )
    radius = model.geom_radius

    h, n = _terrain_height_normal(model, terrain, centers[:, :2])
    phi_g = (centers[:, 2] - h) * n[:, 2] - radius

    if model.wbox_pos.shape[0] > 0:
        rel = centers[:, None, :] - model.wbox_pos[None, :, :]  # (ng,nw,3)
        clamped = jnp.clip(rel, -model.wbox_size[None], model.wbox_size[None])
        delta = rel - clamped
        dist = jnp.linalg.norm(delta, axis=-1)
        inside = dist < 1e-9
        # inside the box: nearest face gives penetration and normal
        face_d = model.wbox_size[None] - jnp.abs(rel)  # (ng,nw,3) >=0 inside
        ax = jnp.argmin(face_d, axis=-1)  # (ng,nw)
        n_inside = (
            jnp.sign(jnp.take_along_axis(rel, ax[..., None], axis=-1))
            * jax.nn.one_hot(ax, 3, dtype=centers.dtype)
        )
        d_inside = jnp.take_along_axis(face_d, ax[..., None], axis=-1)[..., 0]
        n_box = jnp.where(
            inside[..., None],
            n_inside,
            delta / jnp.maximum(dist, 1e-9)[..., None],
        )
        phi_box = jnp.where(inside, -d_inside, dist) - radius[:, None]
        bi = jnp.argmin(phi_box, axis=1)
        phi_b = jnp.take_along_axis(phi_box, bi[:, None], axis=1)[:, 0]
        n_b = jnp.take_along_axis(n_box, bi[:, None, None], axis=1)[:, 0]
        use_box = phi_b < phi_g
        phi = jnp.where(use_box, phi_b, phi_g)
        n = jnp.where(use_box[:, None], n_b, n)
    else:
        phi = phi_g

    contact_pt = centers - n * radius[:, None]
    return phi, n, contact_pt, R


def contact_terms(
    model: Model,
    xpos: jax.Array,
    xquat: jax.Array,
    S: jax.Array,
    V: jax.Array,
    origin: jax.Array,
    terrain: Optional[Terrain],
):
    """Contact spring forces + implicit damping operator.

    The stiff parts of the soft contact (normal damper, Coulomb-friction
    regularisation) are returned as a positive-semidefinite generalized
    damping matrix ``D`` to be folded into an implicit velocity update
    ``(M + dt D) v' = M v + dt f`` — unconditionally stable for the damper
    terms at MuJoCo's 2 ms timestep while the (bounded) penetration spring
    stays explicit.  This is the penalty-contact analogue of MuJoCo's
    'implicitfast' integrator and is what makes a 500 Hz-equivalent
    near-rigid contact (impratio=100, our_robot.xml:3) integrable in one
    fused TPU kernel.

    Returns (qfrc_spring (nv,), D (nv,nv), Contact diagnostics).
    """
    phi, n, contact_pt, R = _contact_geometry(model, xpos, xquat, terrain)
    gb = model.geom_body
    pt_rel = contact_pt - origin
    Vg = jnp.take(V, gb, axis=0)
    v_pt = Vg[:, 3:] + jnp.cross(Vg[:, :3], pt_rel)

    # penetration capped at 5 cm: keeps spring forces finite in f32 even
    # when a fallen robot's geoms end up deep inside the ground/boxes
    pen = jnp.clip(-phi, 0.0, 0.05)
    active = (phi < 0.0).astype(phi.dtype)
    v_n = jnp.einsum("gi,gi->g", v_pt, n)
    k, d = model.geom_stiffness, model.geom_damping
    if model.geom_imp_dmin is not None:
        # progressive impedance (MuJoCo solimp, power 1): soft at
        # touchdown, full stiffness at pen >= width.  Scales the normal
        # spring AND (through fn) the Coulomb limit mu*fn — the
        # touchdown-slip behavior of the reference's soft foot pads
        # (go1.xml:62).  The damper scales with it too, as MuJoCo's
        # impedance scales the whole constraint force.
        imp = (model.geom_imp_dmin
               + (1.0 - model.geom_imp_dmin)
               * jnp.clip(pen / model.geom_imp_width, 0.0, 1.0))
        k = k * imp
        d = d * imp
    fn_spring = jnp.minimum(k * pen, 1e4)  # explicit, bounded

    # point Jacobians (ng, nv, 3)
    mask = jnp.take(model.ancestor_mask, gb, axis=0)
    J = mask[:, :, None] * (
        S[None, :, 3:] + jnp.cross(S[None, :, :3], pt_rel[:, None, :])
    )

    qfrc_spring = jnp.einsum("gvi,g,gi->v", J, fn_spring, n)

    # implicit damping: normal damper (only while approaching or loaded) and
    # tangential friction linearised about the current slip speed with
    # saturation at mu*fn ( coefficient  mu fn / max(|vt|, eps) ).
    v_t = v_pt - v_n[:, None] * n
    vt_norm = jnp.sqrt(jnp.einsum("gi,gi->g", v_t, v_t) + 1e-12)
    mu = model.geom_friction[:, 0]
    eps = model.friction_smoothing
    kappa_t = mu * fn_spring / jnp.maximum(vt_norm, eps)
    d_n = d * active
    # C_g = d_n n n^T + kappa_t (I - n n^T)   (3x3 PSD per geom)
    eye = jnp.eye(3, dtype=phi.dtype)
    nnT = jnp.einsum("gi,gj->gij", n, n)
    C = (
        d_n[:, None, None] * nnT
        + (kappa_t * active)[:, None, None] * (eye[None] - nnT)
    )
    D = jnp.einsum("gvi,gij,gwj->vw", J, C, J)
    if model.geom_imp_dmin is not None:
        # oracle-contact variant (same gate as the progressive
        # impedance): TORSIONAL + ROLLING friction, the condim=6 part of
        # the reference foot (go1.xml:62 friction "0.8 0.02 0.01").
        # Without it a sphere foot pivots frictionlessly about the
        # contact — stance legs roll forward like wheels, a systematic
        # propulsion surplus vs the oracle.  Linearised about the
        # current angular slip exactly like the sliding term:
        # resisting torque = -mu_r * fn / max(|w|, eps_r) * w, split by
        # normal (torsional) / tangential (rolling) components, folded
        # into D through the ANGULAR Jacobian (torque on the body).
        w_g = Vg[:, :3]
        w_n = jnp.einsum("gi,gi->g", w_g, n)
        w_t = w_g - w_n[:, None] * n
        wt_norm = jnp.sqrt(jnp.einsum("gi,gi->g", w_t, w_t) + 1e-12)
        eps_r = 0.5  # rad/s linearisation scale
        mu_tors = model.geom_friction[:, 1]
        mu_roll = model.geom_friction[:, 2]
        kap_tors = mu_tors * fn_spring / jnp.maximum(jnp.abs(w_n), eps_r)
        kap_roll = mu_roll * fn_spring / jnp.maximum(wt_norm, eps_r)
        C_ang = ((kap_tors * active)[:, None, None] * nnT
                 + (kap_roll * active)[:, None, None] * (eye[None] - nnT))
        J_ang = mask[:, :, None] * S[None, :, :3]
        D = D + jnp.einsum("gvi,gij,gwj->vw", J_ang, C_ang, J_ang)

    # diagnostics with the saturated Coulomb model at the current velocity
    fn_diag = jnp.maximum(fn_spring - d * v_n, 0.0) * active
    f_t = -(mu * fn_diag / jnp.maximum(vt_norm, eps))[:, None] * v_t
    force = fn_diag[:, None] * n + f_t
    Rg = jnp.take(R, gb, axis=0)
    contact = Contact(
        force_world=force,
        force_body=jnp.einsum("gji,gj->gi", Rg, force),
        penetration=pen,
        in_contact=(phi < 0.0) & (fn_diag > 0),
    )
    return qfrc_spring, D, contact


# ---------------------------------------------------------------------------
# Forward dynamics + integration
# ---------------------------------------------------------------------------


def forward(
    model: Model,
    qpos: jax.Array,
    qvel: jax.Array,
    ctrl: jax.Array,
    terrain: Optional[Terrain] = None,
    dt: Optional[float] = None,
):
    """Forward dynamics with implicit-damping velocity update.

    Solves  (M + dt D) v' = M v + dt f_explicit  where ``D`` collects the
    stiff velocity-proportional terms (contact damper, friction
    linearisation, joint damping/friction-loss).  Returns (qvel_next, aux).
    """
    if dt is None:
        dt = model.timestep
    xpos, xquat = fk(model, qpos)
    origin = xpos[0]
    S = motion_subspace(model, xpos, xquat, origin)
    V = body_velocities(model, S, qvel)
    I_O = _spatial_inertias(model, xpos, xquat, origin)

    M = mass_matrix(model, S, I_O)
    C = bias_forces(model, S, V, I_O, qvel)
    qfrc_act = actuator_forces(model, qpos, qvel, ctrl)
    tau_lim, d_diag = passive_terms(model, qpos, qvel)
    qfrc_con, D_con, contact = contact_terms(
        model, xpos, xquat, S, V, origin, terrain
    )

    f_explicit = qfrc_act + tau_lim + qfrc_con - C
    A = M + dt * (D_con + jnp.diag(d_diag))
    rhs = M @ qvel + dt * f_explicit
    qvel_next = arrow_solve(model, A, rhs)
    # firewall: a numerically failed solve (f32 overflow in a pathological
    # pose) must not inject NaN into the carried state — keep the previous
    # (clamped) velocity for that substep instead
    qvel_next = jnp.where(
        jnp.isfinite(qvel_next), qvel_next, jnp.clip(qvel, -1e3, 1e3)
    )
    return qvel_next, dict(
        xpos=xpos, xquat=xquat, contact=contact, qfrc_actuator=qfrc_act,
        mass_matrix=M,
    )


def integrate(model: Model, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
    """Semi-implicit position update with exact quaternion integration."""
    new_parts = []
    for i in range(model.nbody):
        adr = model.body_qpos_adr[i]
        dadr = model.body_dof_adr[i]
        if model.jnt_type[i] == JNT_FREE:
            pos = qpos[adr : adr + 3] + dt * qvel[dadr : dadr + 3]
            quat = spatial.quat_integrate(
                qpos[adr + 3 : adr + 7], qvel[dadr + 3 : dadr + 6], dt
            )
            new_parts.append(pos)
            new_parts.append(quat)
        elif model.jnt_type[i] == JNT_HINGE:
            new_parts.append(qpos[adr : adr + 1] + dt * qvel[dadr : dadr + 1])
    return jnp.concatenate(new_parts)


def step(
    model: Model,
    state: State,
    ctrl: jax.Array,
    terrain: Optional[Terrain] = None,
    n_substeps: int = 1,
    precision: Optional[str] = "highest",
) -> Tuple[State, StepInfo]:
    """Advance ``n_substeps`` physics substeps of ``model.timestep`` under a
    held control (MuJoCo ``frame_skip`` semantics — the reference steps 10
    substeps per control at 50 Hz, ``environments/WalkEnvironment.py:36``,
    and 50 per policy step in the sim2real stack, ``sim2real/train.py:156``).

    ``precision`` guards the tiny einsums/matmuls of the op-graph path
    against TPU default-precision MXU rounding, which corrupts the physics
    (~7e-3 qvel error/substep vs 3.1e-6 on the fused kernel — measured in
    tests/test_pallas_core.py).  Default "highest" keeps every consumer
    (envs, solvers, twins) numerically honest on TPU; the substep is
    op-overhead-bound at these shapes so the cost is small (measured in
    docs/PRECISION.md).  Pass ``None`` to inherit the ambient JAX default.
    """
    if precision is not None:
        with jax.default_matmul_precision(precision):
            return step(model, state, ctrl, terrain, n_substeps,
                        precision=None)
    dt = model.timestep

    def substep(carry, _):
        qpos, qvel = carry
        qvel2, aux = forward(model, qpos, qvel, ctrl, terrain, dt)
        # numerical firewall: physical robots never exceed these rates; the
        # clamp stops a single bad contact event (deep penetration at a
        # pathological pose) from cascading into f32 overflow/NaN during
        # large batched rollouts
        qvel2 = jnp.clip(qvel2, -1e3, 1e3)
        qpos2 = integrate(model, qpos, qvel2, dt)
        info = StepInfo(
            contact=aux["contact"],
            qfrc_actuator=aux["qfrc_actuator"],
            qacc=(qvel2 - qvel) / dt,
            xpos=aux["xpos"],
            xquat=aux["xquat"],
        )
        return (qpos2, qvel2), info

    if n_substeps <= 8:
        # unroll short substep loops: removes per-iteration while-loop
        # overhead, which dominates inside MPC rollouts (25 x 4 substeps of
        # ~100 small fused kernels each)
        carry = (state.qpos, state.qvel)
        info = None
        for _ in range(n_substeps):
            carry, info = substep(carry, None)
        qpos, qvel = carry
        last_info = info
    else:
        (qpos, qvel), infos = jax.lax.scan(
            substep, (state.qpos, state.qvel), None, length=n_substeps,
            unroll=min(4, n_substeps),
        )
        last_info = jax.tree.map(lambda x: x[-1], infos)
    return State(qpos=qpos, qvel=qvel, time=state.time + dt * n_substeps), last_info


def foot_contact_summary(model: Model, contact: Contact):
    """Aggregate per-geom contact into per-foot quantities.

    Returns (force_world (nfeet,3), force_body (nfeet,3), in_contact (nfeet,))
    matching the reference's per-paw contact extraction
    (``walk_environment_reward_calc.py:318-370``)."""
    feet = model.foot_body
    gb = np.array(model.geom_body_static)
    fw, fb, ic = [], [], []
    for foot in feet:
        sel = (gb == foot).astype(np.float32)
        fw.append(jnp.einsum("g,gi->i", sel, contact.force_world))
        fb.append(jnp.einsum("g,gi->i", sel, contact.force_body))
        ic.append(jnp.max(jnp.where(gb == foot, contact.in_contact, False)))
    return jnp.stack(fw), jnp.stack(fb), jnp.stack(ic)

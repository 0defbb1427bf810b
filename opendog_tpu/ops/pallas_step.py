"""Fused Pallas TPU kernel for the physics substep.

Wraps the scalarized substep (:mod:`opendog_tpu.ops.scalar_core`) in a single
``pallas_call``: state rows live as ``(rows, K)`` blocks in VMEM with the
robot batch on the 128-wide vector lanes, and the entire Featherstone
substep — FK, inertias, bias, arrow-sparse implicit solve, contact,
integration — executes as one fused kernel with no per-op HBM round trips.
This is the speed-of-light path for the MPC rollout engine (BASELINE
configs 2/4): the XLA op-granular version spends ~µs-per-op overhead on
thousands of tiny tensors; here they are register/VMEM streams.

Layout: qpos (nq, K), qvel (nv, K), ctrl (nu, K); K should be a multiple of
128 (the lane width).  The kernel grid tiles K.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.model import Model
from . import scalar_core


def build_pallas_substep(
    model: Model,
    dt: float,
    k_tile: int = 256,
    n_substeps: int = 1,
    interpret: bool = False,
    with_plane: bool = False,
    with_payload: bool = False,
    unroll: bool = True,
):
    """Returns ``step(qpos (nq, K), qvel (nv, K), ctrl (nu, K)[, plane
    (4, K)][, payload (1, K)]) -> (qpos', qvel')`` running ``n_substeps``
    fused substeps per kernel invocation.  With ``with_plane=True`` each
    lane carries its own contact plane (nx, ny, nz, d) — the local-plane
    terrain approximation and per-scenario ground randomization hook.
    With ``with_plane="per_geom"`` the plane input is ``(4 * ngeom, K)``:
    an independent tangent plane per collision geom (rows 4g..4g+3), so
    every paw contacts the terrain under ITS OWN position — see
    ``scalar_core.build_substep``.  With ``with_payload=True`` each lane
    carries a payload mass [kg] rigidly attached at the trunk origin."""
    substep = scalar_core.build_substep(model, dt, with_plane=with_plane,
                                        with_payload=with_payload)
    nq, nv, nu = model.nq, model.nv, model.nu
    plane_rows = (4 * model.ngeom if with_plane == "per_geom"
                  else 4 if with_plane else 0)

    def kernel(*refs):
        refs = list(refs)
        qpos_ref = refs.pop(0)
        qvel_ref = refs.pop(0)
        ctrl_ref = refs.pop(0)
        plane = None
        payload = None
        if with_plane:
            plane_ref = refs.pop(0)
            plane = tuple(plane_ref[i, :] for i in range(plane_rows))
        if with_payload:
            payload = refs.pop(0)[0, :]
        qpos_out, qvel_out = refs
        qp = tuple(qpos_ref[i, :] for i in range(nq))
        qv = tuple(qvel_ref[i, :] for i in range(nv))
        ct = tuple(ctrl_ref[i, :] for i in range(nu))
        if unroll or n_substeps == 1:
            for _ in range(n_substeps):
                qp, qv = substep(qp, qv, ct, plane, payload)
        else:
            # fori_loop keeps the kernel body at ONE substep graph: the
            # unrolled plant kernel (n_substeps=10) traces ~10x the
            # substep's ops, which dominates client-side LOWERING time of
            # the MPC tick (~120 s on the tunnel); the loop form trades
            # that for negligible on-chip loop overhead (the body is
            # thousands of serial vector ops).
            qp, qv = jax.lax.fori_loop(
                0, n_substeps,
                lambda _, c: substep(c[0], c[1], ct, plane, payload),
                (qp, qv))
        for i in range(nq):
            qpos_out[i, :] = qp[i]
        for i in range(nv):
            qvel_out[i, :] = qv[i]

    @jax.jit
    def step(qpos, qvel, ctrl, plane=None, payload=None):
        K = qpos.shape[1]
        assert K % k_tile == 0, (K, k_tile)
        grid = (K // k_tile,)
        out_shapes = (
            jax.ShapeDtypeStruct((nq, K), qpos.dtype),
            jax.ShapeDtypeStruct((nv, K), qvel.dtype),
        )

        def spec(rows):
            return pl.BlockSpec((rows, k_tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        in_specs = [spec(nq), spec(nv), spec(nu)]
        args = [qpos, qvel, ctrl]
        if with_plane:
            assert plane is not None and plane.shape == (plane_rows, K)
            in_specs.append(spec(plane_rows))
            args.append(plane)
        if with_payload:
            assert payload is not None and payload.shape == (1, K)
            in_specs.append(spec(1))
            args.append(payload)
        out_specs = (spec(nq), spec(nv))
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(*args)

    return step


def rows_from_batch(arr):
    """(K, n) batch-first -> (n, K) lane layout."""
    return jnp.swapaxes(arr, 0, 1)


def batch_from_rows(arr):
    return jnp.swapaxes(arr, 0, 1)

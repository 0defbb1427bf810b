"""Scalarized substep core + fused Pallas kernel equivalence.

Gated behind OPENDOG_SLOW_TESTS=1: the scalarized graph takes minutes to
compile on the CPU backend.  The same checks run routinely on the TPU via
bench.py / scripts (see .scratch logs); this file makes them repeatable.

Measured on TPU v5e (K=4096, go1): fused kernel 0.92 ms/step vs 11.46 ms
for the op-graph path (12.5x), with median error vs CPU-f32 ground truth
3.1e-6 vs 7.1e-3 (default-precision MXU rounding corrupts the op-graph
path; the fused kernel is pure f32 VPU math).
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opendog_tpu.assets import load_go1
from opendog_tpu.physics import State, dynamics, make_state

slow = pytest.mark.skipif(
    os.environ.get("OPENDOG_SLOW_TESTS") != "1",
    reason="minutes-long CPU compile; set OPENDOG_SLOW_TESTS=1",
)


def _random_batch(m, K, seed=1):
    rng = np.random.default_rng(seed)
    s0 = make_state(m, "home")
    qpos = np.tile(np.asarray(s0.qpos)[None], (K, 1)).astype(np.float32)
    qpos[:, :3] += rng.normal(0, 0.01, (K, 3))
    qpos[:, 7:] += rng.normal(0, 0.05, (K, m.nq - 7))
    qvel = rng.normal(0, 0.3, (K, m.nv)).astype(np.float32)
    ctrl = np.tile(np.asarray(m.key_ctrl[0])[None], (K, 1)).astype(np.float32)
    return qpos, qvel, ctrl


@slow
def test_scalar_core_matches_dynamics_step():
    from opendog_tpu.ops.scalar_core import build_substep

    m = load_go1("flat")
    K = 4
    qpos, qvel, ctrl = _random_batch(m, K)
    st = State(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
               time=jnp.zeros(K))
    ref, _ = jax.vmap(lambda a, c: dynamics.step(m, a, c, n_substeps=1))(
        st, jnp.asarray(ctrl))
    sub = build_substep(m, m.timestep)
    qp_rows = tuple(jnp.asarray(qpos[:, i]) for i in range(m.nq))
    qv_rows = tuple(jnp.asarray(qvel[:, i]) for i in range(m.nv))
    ct_rows = tuple(jnp.asarray(ctrl[:, i]) for i in range(m.nu))
    qp2, qv2 = jax.jit(sub)(qp_rows, qv_rows, ct_rows)
    qp2 = np.stack([np.asarray(r) for r in qp2], axis=1)
    qv2 = np.stack([np.asarray(r) for r in qv2], axis=1)
    np.testing.assert_allclose(qp2, np.asarray(ref.qpos), atol=1e-4)
    np.testing.assert_allclose(qv2, np.asarray(ref.qvel), atol=5e-3)


@slow
def test_pallas_substep_interpret_matches():
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_go1("flat")
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K)
    st = State(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
               time=jnp.zeros(K))
    ref, _ = jax.vmap(lambda a, c: dynamics.step(m, a, c, n_substeps=1))(
        st, jnp.asarray(ctrl))
    step = build_pallas_substep(m, m.timestep, k_tile=K, n_substeps=1,
                                interpret=True)
    qp2, qv2 = step(jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                    jnp.asarray(ctrl.T))
    np.testing.assert_allclose(np.asarray(qp2).T, np.asarray(ref.qpos),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(qv2).T, np.asarray(ref.qvel),
                               atol=5e-3)


@slow
def test_mppi_pallas_engine_interpret():
    """The engine='pallas' rollout path produces a finite plan that tracks
    the xla engine's plan on the same noise key."""
    import opendog_tpu.ops.pallas_step as ps
    from opendog_tpu.solvers import MPPIConfig, costs, mppi

    m = load_go1("flat")
    p = costs.TrotCostParams(desired_vel_xy=(0.5, 0.0), target_height=0.265)
    cost = costs.trot_cost(m, p, np.asarray(m.key_qpos[0])[7:])
    base = dict(horizon=4, num_samples=8, n_substeps=1, rollout_dt=0.01,
                noise_sigma=0.12, temperature=0.3)
    s0 = make_state(m, "home")
    key = jax.random.PRNGKey(0)

    orig = ps.build_pallas_substep
    ps.build_pallas_substep = lambda *a, **kw: orig(
        *a, **{**kw, "interpret": True})
    try:
        outs = {}
        for engine in ("xla", "pallas"):
            cfg = MPPIConfig(engine=engine, **base)
            solve = mppi.make_solver(m, cost, cfg)
            ms = mppi.init_state(m, cfg)
            ctrl, _, stats = jax.jit(solve)(s0, ms, key)
            outs[engine] = (np.asarray(ctrl), float(stats["best_cost"]))
    finally:
        ps.build_pallas_substep = orig
    np.testing.assert_allclose(outs["pallas"][0], outs["xla"][0], atol=1e-3)
    assert abs(outs["pallas"][1] - outs["xla"][1]) < 1e-2 * (
        1.0 + abs(outs["xla"][1]))


@slow
def test_plane_kernel_matches_flat_at_z0():
    """with_plane=True fed the canonical z=0 plane must reproduce the
    flat kernel; a raised plane (d>0) must change the contact response."""
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_go1("flat")
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K)
    qp, qv, ct = (jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                  jnp.asarray(ctrl.T))
    flat = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True)
    planar = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True,
                                  with_plane=True)
    z0 = jnp.tile(jnp.array([0.0, 0.0, 1.0, 0.0])[:, None], (1, K))
    qp_f, qv_f = flat(qp, qv, ct)
    qp_p, qv_p = planar(qp, qv, ct, z0)
    np.testing.assert_allclose(np.asarray(qv_p), np.asarray(qv_f), atol=1e-5)

    # ground lowered 0.5 m below the feet: all contacts release -> the
    # base accelerates downward (gravity only) vs. the supported case
    lowered = jnp.tile(jnp.array([0.0, 0.0, 1.0, -0.5])[:, None], (1, K))
    _, qv_r = planar(qp, qv, ct, lowered)
    assert float(np.asarray(qv_r)[2].mean()) < float(
        np.asarray(qv_f)[2].mean()) - 1e-3


@slow
def test_payload_kernel_physics():
    """A per-lane trunk payload must (a) be inert at payload=0 (exactly
    the flat kernel) and (b) make a supported robot settle with larger
    contact loading — heavier lanes decelerate falls more slowly."""
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_go1("flat")
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K)
    qp, qv, ct = (jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                  jnp.asarray(ctrl.T))
    flat = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True)
    loaded = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True,
                                  with_payload=True)
    zero_pl = jnp.zeros((1, K))
    qp_f, qv_f = flat(qp, qv, ct)
    qp_0, qv_0 = loaded(qp, qv, ct, None, zero_pl)
    np.testing.assert_allclose(np.asarray(qv_0), np.asarray(qv_f), atol=1e-5)

    # 5 kg payload on a ~12.7 kg robot in free space (base high up): the
    # same actuator torques produce smaller base acceleration response;
    # under gravity only, both fall identically — so check the joint
    # coupling instead: base angular response to a knee torque shrinks.
    qpos_air = qpos.copy(); qpos_air[:, 2] += 2.0  # no contact
    qp_a = jnp.asarray(qpos_air.T)
    heavy = jnp.full((1, K), 5.0)
    _, qv_l = loaded(qp_a, qv, ct, None, zero_pl)
    _, qv_h = loaded(qp_a, qv, ct, None, heavy)
    dv_l = np.abs(np.asarray(qv_l)[:6] - np.asarray(qv)[:6]).mean()
    dv_h = np.abs(np.asarray(qv_h)[:6] - np.asarray(qv)[:6]).mean()
    assert dv_h < dv_l  # heavier trunk reacts less to the same torques

"""Scalarized substep core + fused Pallas kernel equivalence.

The flagship engine is exercised in the DEFAULT gate two ways:
  * the go1 scalarized core runs EAGERLY (``jax.disable_jit``) against the
    op-graph reference — compiling its ~48k-op graph takes ~7 min on the
    CPU backend, but eager execution costs ~15 s;
  * every Pallas kernel feature (fused substep, per-lane contact plane,
    per-lane payload, the engine="pallas" MPPI path) runs JITTED in
    interpret mode on the ``mini`` model (assets/mini.py) — same kernel
    builder, same block-arrow structure, seconds to compile.
``OPENDOG_SLOW_TESTS=1`` additionally runs the go1-sized kernels through
the compiled path (the configuration bench.py exercises on the TPU).

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

from opendog_tpu.assets import load_go1, load_mini
from opendog_tpu.physics import State, dynamics, make_state

slow = pytest.mark.skipif(
    os.environ.get("OPENDOG_SLOW_TESTS") != "1",
    reason="minutes-long CPU compile; set OPENDOG_SLOW_TESTS=1",
)


def _random_batch(m, K, seed=1):
    rng = np.random.default_rng(seed)
    qpos = np.tile(np.asarray(m.key_qpos[0]), (K, 1)).astype(np.float32)
    qpos[:, :3] += rng.normal(0, 0.01, (K, 3))
    qpos[:, 7:] += rng.normal(0, 0.05, (K, m.nq - 7))
    qvel = rng.normal(0, 0.2, (K, m.nv)).astype(np.float32)
    lo, hi = np.asarray(m.actuator_ctrlrange).T
    ctrl = rng.uniform(lo, hi, (K, m.nu)).astype(np.float32)
    return qpos, qvel, ctrl


def _ref_step(m, qpos, qvel, ctrl):
    st = State(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
               time=jnp.zeros(qpos.shape[0]))
    ref, _ = jax.jit(jax.vmap(
        lambda a, c: dynamics.step(m, a, c, n_substeps=1)))(
        st, jnp.asarray(ctrl))
    return ref


# ---------------------------------------------------------------------------
# default gate: go1 scalar core, EAGER (compile too slow, execution is not)
# ---------------------------------------------------------------------------

def test_scalar_core_matches_dynamics_step():
    from opendog_tpu.ops.scalar_core import build_substep

    m = load_go1("flat")
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K)
    ref = _ref_step(m, qpos, qvel, ctrl)
    sub = build_substep(m, m.timestep)
    qp_rows = tuple(jnp.asarray(qpos[:, i]) for i in range(m.nq))
    qv_rows = tuple(jnp.asarray(qvel[:, i]) for i in range(m.nv))
    ct_rows = tuple(jnp.asarray(ctrl[:, i]) for i in range(m.nu))
    with jax.disable_jit():
        qp2, qv2 = sub(qp_rows, qv_rows, ct_rows)
    qp2 = np.stack([np.asarray(r) for r in qp2], axis=1)
    qv2 = np.stack([np.asarray(r) for r in qv2], axis=1)
    np.testing.assert_allclose(qp2, np.asarray(ref.qpos), atol=1e-4)
    np.testing.assert_allclose(qv2, np.asarray(ref.qvel), atol=5e-3)


# ---------------------------------------------------------------------------
# default gate: every Pallas kernel feature, JITTED on the mini model
# ---------------------------------------------------------------------------

def test_mini_pallas_substep_interpret_matches():
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_mini()
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K)
    ref = _ref_step(m, qpos, qvel, ctrl)
    step = build_pallas_substep(m, m.timestep, k_tile=K, n_substeps=1,
                                interpret=True)
    qp2, qv2 = step(jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                    jnp.asarray(ctrl.T))
    np.testing.assert_allclose(np.asarray(qp2).T, np.asarray(ref.qpos),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(qv2).T, np.asarray(ref.qvel),
                               atol=5e-3)


def test_mini_plane_kernel_matches_flat_at_z0():
    """with_plane=True fed the canonical z=0 plane must reproduce the
    flat kernel; a lowered plane must change the contact response."""
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_mini()
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K, seed=3)
    qp, qv, ct = (jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                  jnp.asarray(ctrl.T))
    flat = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True)
    planar = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True,
                                  with_plane=True)
    z0 = jnp.tile(jnp.array([0.0, 0.0, 1.0, 0.0])[:, None], (1, K))
    qp_f, qv_f = flat(qp, qv, ct)
    qp_p, qv_p = planar(qp, qv, ct, z0)
    np.testing.assert_allclose(np.asarray(qv_p), np.asarray(qv_f),
                               atol=1e-5)

    # ground lowered 0.5 m below the feet: all contacts release -> the
    # base accelerates downward (gravity only) vs. the supported case
    lowered = jnp.tile(jnp.array([0.0, 0.0, 1.0, -0.5])[:, None], (1, K))
    _, qv_r = planar(qp, qv, ct, lowered)
    assert float(np.asarray(qv_r)[2].mean()) < float(
        np.asarray(qv_f)[2].mean()) - 1e-3


def test_mini_payload_kernel_physics():
    """A per-lane trunk payload must (a) be inert at payload=0 (exactly
    the flat kernel) and (b) make a free-floating robot react less to the
    same torques (larger inertia)."""
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_mini()
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K, seed=5)
    qp, qv, ct = (jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                  jnp.asarray(ctrl.T))
    flat = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True)
    loaded = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True,
                                  with_payload=True)
    zero_pl = jnp.zeros((1, K))
    qp_f, qv_f = flat(qp, qv, ct)
    qp_0, qv_0 = loaded(qp, qv, ct, None, zero_pl)
    np.testing.assert_allclose(np.asarray(qv_0), np.asarray(qv_f),
                               atol=1e-5)

    qpos_air = qpos.copy(); qpos_air[:, 2] += 2.0  # no contact
    qp_a = jnp.asarray(qpos_air.T)
    heavy = jnp.full((1, K), 5.0)
    _, qv_l = loaded(qp_a, qv, ct, None, zero_pl)
    _, qv_h = loaded(qp_a, qv, ct, None, heavy)
    dv_l = np.abs(np.asarray(qv_l)[:6] - np.asarray(qv)[:6]).mean()
    dv_h = np.abs(np.asarray(qv_h)[:6] - np.asarray(qv)[:6]).mean()
    assert dv_h < dv_l  # heavier trunk reacts less to the same torques


def _ramp_terrain_mini(slope=0.08, n=9, half=2.0):
    """Mini model + a LINEAR x-ramp heightfield.  On a linear surface the
    per-geom tangent planes ARE the surface, so the plane kernel and the
    exact-bilinear op-graph contact see identical geometry."""
    from opendog_tpu.physics import Terrain

    m = load_mini().replace(
        hfield_size=jnp.asarray([half, half, 1.0, 0.0], jnp.float32))
    xs = np.linspace(-half, half, n, dtype=np.float32)
    height = np.tile(slope * xs[None, :], (n, 1))  # row ~ y, col ~ x
    return m, Terrain(height=jnp.asarray(height))


def test_mini_loop_substeps_bitidentical_to_unrolled():
    """unroll=False (fori_loop substeps inside the kernel) must be
    BIT-identical to the unrolled kernel on the flat path — it is the
    plant integrator of every flat MPC loop (chosen for its ~9x faster
    client-side trace)."""
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_mini()
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K, seed=11)
    qp, qv, ct = (jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                  jnp.asarray(ctrl.T))
    a = build_pallas_substep(m, m.timestep, k_tile=K, n_substeps=10,
                             interpret=True)
    b = build_pallas_substep(m, m.timestep, k_tile=K, n_substeps=10,
                             interpret=True, unroll=False)
    qa, va = a(qp, qv, ct)
    qb, vb = b(qp, qv, ct)
    assert np.array_equal(np.asarray(qa), np.asarray(qb))
    assert np.array_equal(np.asarray(va), np.asarray(vb))


def test_mini_pergeom_plane_matches_lane_plane_when_equal():
    """with_plane="per_geom" fed the SAME plane for every geom must
    reproduce the per-lane plane kernel exactly (same scalar graph, same
    ordering)."""
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_mini()
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K, seed=7)
    qp, qv, ct = (jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                  jnp.asarray(ctrl.T))
    lane = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True,
                                with_plane=True)
    pg = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True,
                              with_plane="per_geom")
    n = np.array([0.1, -0.05, 1.0])
    n = n / np.linalg.norm(n)
    row = np.array([n[0], n[1], n[2], -0.02], np.float32)
    lane_plane = jnp.tile(jnp.asarray(row)[:, None], (1, K))
    pg_plane = jnp.tile(jnp.asarray(np.tile(row, m.ngeom))[:, None], (1, K))
    qp_l, qv_l = lane(qp, qv, ct, lane_plane)
    qp_g, qv_g = pg(qp, qv, ct, pg_plane)
    # same scalar graph up to compiler reassociation (different operand
    # packing changes fusion order): agreement to 1e-4 on qvel rows whose
    # magnitudes reach ~1e2
    np.testing.assert_allclose(np.asarray(qp_g), np.asarray(qp_l),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(qv_g), np.asarray(qv_l),
                               atol=1e-4)


def test_geom_local_planes_on_ramp():
    """geom_local_planes returns each geom's tangent plane; on a linear
    ramp every plane is the ramp itself: n ∝ (-s, 0, 1), d = 0."""
    m, terr = _ramp_terrain_mini(slope=0.08)
    s0 = make_state(m, "home")
    planes = np.asarray(dynamics.geom_local_planes(m, terr, s0.qpos))
    assert planes.shape == (m.ngeom, 4)
    n_ref = np.array([-0.08, 0.0, 1.0])
    n_ref = n_ref / np.linalg.norm(n_ref)
    np.testing.assert_allclose(planes[:, :3], np.tile(n_ref, (m.ngeom, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(planes[:, 3], 0.0, atol=1e-5)


def test_mini_pergeom_kernel_substep_matches_exact_bilinear_on_ramp():
    """One substep of the per-geom plane kernel vs the exact-bilinear
    op-graph path from a batch of random states on the ramp.  On a linear
    surface the per-geom tangent planes ARE the surface, so this isolates
    the contact-model agreement: measured max qvel error 7.6e-5 (multi-
    tick trajectory comparison is meaningless here — the 2-leg mini
    TUMBLES on a slope, so chaos amplifies float noise; the stable-robot
    trajectory deviation is measured on the opendog terrain bench,
    scripts/bench_suite.py config 2c_pergeom)."""
    from opendog_tpu.ops.pallas_step import build_pallas_substep
    from opendog_tpu.physics import State

    m, terr = _ramp_terrain_mini(slope=0.08)
    K = 8
    rng = np.random.default_rng(2)
    qpos = np.tile(np.asarray(m.key_qpos[0]), (K, 1)).astype(np.float32)
    qpos[:, :3] += rng.normal(0, 0.01, (K, 3))
    qpos[:, 0] += rng.uniform(-1, 1, K)   # spread along the ramp
    qpos[:, 7:] += rng.normal(0, 0.05, (K, m.nq - 7))
    qvel = rng.normal(0, 0.2, (K, m.nv)).astype(np.float32)
    lo, hi = np.asarray(m.actuator_ctrlrange).T
    ctrl = rng.uniform(lo, hi, (K, m.nu)).astype(np.float32)

    st = State(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
               time=jnp.zeros(K))
    ref, _ = jax.jit(jax.vmap(
        lambda a, c: dynamics.step(m, a, c, terr, n_substeps=1)))(
        st, jnp.asarray(ctrl))
    psub = build_pallas_substep(m, m.timestep, k_tile=K, n_substeps=1,
                                interpret=True, with_plane="per_geom")
    planes = jax.vmap(
        lambda q: dynamics.geom_local_planes(m, terr, q))(st.qpos)
    qp2, qv2 = psub(jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                    jnp.asarray(ctrl.T), planes.reshape(K, -1).T)
    np.testing.assert_allclose(np.asarray(qp2).T, np.asarray(ref.qpos),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(qv2).T, np.asarray(ref.qvel),
                               atol=1e-3)


def test_mini_mpc_terrain_kernel_plant_runs():
    """make_mpc(terrain_plant="kernel", plane_mode="per_geom") wires the
    whole terrain MPC loop through the fused kernel: finite states, and
    the standing controller keeps the mini at stand height on a gentle
    ramp (trajectory-matching the exact plant is not meaningful — the
    closed loop amplifies integrator float noise; single-substep
    equivalence is pinned above)."""
    import opendog_tpu.ops.pallas_step as ps
    from opendog_tpu.solvers import MPPIConfig, costs, make_mpc

    m, terr = _ramp_terrain_mini(slope=0.02)
    home_j = np.asarray(m.key_qpos[0])[7:]
    cost = costs.standing_cost(m, 0.115, home_j)
    cfg = MPPIConfig(horizon=4, num_samples=8, n_substeps=1,
                     rollout_dt=0.004, noise_sigma=0.05, engine="pallas")
    orig = ps.build_pallas_substep
    try:
        ps.build_pallas_substep = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        init, tick, run = make_mpc(m, cost, cfg, plant_substeps=5,
                                   terrain=terr, terrain_plant="kernel",
                                   plane_mode="per_geom")
        carry = init(jax.random.PRNGKey(0), make_state(m, "home"))
        carry, _ = jax.jit(lambda c: run(c, 10))(carry)
        q = np.asarray(carry.plant.qpos)
    finally:
        ps.build_pallas_substep = orig
    assert np.isfinite(q).all()
    assert 0.07 < q[2] < 0.16  # still standing on its planes


def test_mini_mppi_pallas_engine_interpret():
    """The engine='pallas' rollout path produces a finite plan that tracks
    the xla engine's plan on the same noise key (mini model, jitted)."""
    import opendog_tpu.ops.pallas_step as ps
    from opendog_tpu.solvers import MPPIConfig, costs, mppi

    m = load_mini()
    home_j = np.asarray(m.key_qpos[0])[7:]
    cost = costs.standing_cost(m, 0.115, home_j)
    base = dict(horizon=4, num_samples=8, n_substeps=1, rollout_dt=0.004)
    s0 = make_state(m, "home")
    key = jax.random.PRNGKey(0)
    orig = ps.build_pallas_substep
    outs = {}
    try:
        ps.build_pallas_substep = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        for engine in ("xla", "pallas"):
            cfg = MPPIConfig(engine=engine, **base)
            solve = mppi.make_solver(m, cost, cfg)
            ms = mppi.init_state(m, cfg)
            ctrl, _, stats = jax.jit(solve)(s0, ms, key)
            outs[engine] = (np.asarray(ctrl), float(stats["best_cost"]))
    finally:
        ps.build_pallas_substep = orig
    assert np.all(np.isfinite(outs["pallas"][0]))
    assert abs(outs["pallas"][1] - outs["xla"][1]) < 0.25 * (
        1.0 + abs(outs["xla"][1]))


# ---------------------------------------------------------------------------
# slow gate: the go1-sized kernels through the compiled path
# ---------------------------------------------------------------------------

@slow
def test_pallas_substep_interpret_matches():
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_go1("flat")
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K)
    ref = _ref_step(m, qpos, qvel, ctrl)
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
    """go1-sized engine='pallas' vs 'xla' MPPI plan equivalence."""
    import opendog_tpu.ops.pallas_step as ps
    from opendog_tpu.solvers import MPPIConfig, costs, mppi

    m = load_go1("flat")
    home_j = np.asarray(m.key_qpos[0])[7:]
    cost = costs.standing_cost(m, 0.27, home_j)
    base = dict(horizon=3, num_samples=8, n_substeps=1, rollout_dt=0.004)
    s0 = make_state(m, "home")
    key = jax.random.PRNGKey(0)
    orig = ps.build_pallas_substep
    outs = {}
    try:
        ps.build_pallas_substep = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        for engine in ("xla", "pallas"):
            cfg = MPPIConfig(engine=engine, **base)
            solve = mppi.make_solver(m, cost, cfg)
            ms = mppi.init_state(m, cfg)
            ctrl, _, stats = jax.jit(solve)(s0, ms, key)
            outs[engine] = (np.asarray(ctrl), float(stats["best_cost"]))
    finally:
        ps.build_pallas_substep = orig
    assert np.all(np.isfinite(outs["pallas"][0]))
    assert abs(outs["pallas"][1] - outs["xla"][1]) < 0.25 * (
        1.0 + abs(outs["xla"][1]))


@slow
def test_plane_kernel_matches_flat_at_z0():
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_go1("flat")
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K, seed=3)
    qp, qv, ct = (jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                  jnp.asarray(ctrl.T))
    flat = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True)
    planar = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True,
                                  with_plane=True)
    z0 = jnp.tile(jnp.array([0.0, 0.0, 1.0, 0.0])[:, None], (1, K))
    qp_f, qv_f = flat(qp, qv, ct)
    qp_p, qv_p = planar(qp, qv, ct, z0)
    np.testing.assert_allclose(np.asarray(qv_p), np.asarray(qv_f),
                               atol=1e-5)
    lowered = jnp.tile(jnp.array([0.0, 0.0, 1.0, -0.5])[:, None], (1, K))
    _, qv_r = planar(qp, qv, ct, lowered)
    assert float(np.asarray(qv_r)[2].mean()) < float(
        np.asarray(qv_f)[2].mean()) - 1e-3


@slow
def test_payload_kernel_physics():
    from opendog_tpu.ops.pallas_step import build_pallas_substep

    m = load_go1("flat")
    K = 8
    qpos, qvel, ctrl = _random_batch(m, K, seed=5)
    qp, qv, ct = (jnp.asarray(qpos.T), jnp.asarray(qvel.T),
                  jnp.asarray(ctrl.T))
    flat = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True)
    loaded = build_pallas_substep(m, m.timestep, k_tile=K, interpret=True,
                                  with_payload=True)
    zero_pl = jnp.zeros((1, K))
    qp_f, qv_f = flat(qp, qv, ct)
    qp_0, qv_0 = loaded(qp, qv, ct, None, zero_pl)
    np.testing.assert_allclose(np.asarray(qv_0), np.asarray(qv_f),
                               atol=1e-5)
    qpos_air = qpos.copy(); qpos_air[:, 2] += 2.0
    qp_a = jnp.asarray(qpos_air.T)
    heavy = jnp.full((1, K), 5.0)
    _, qv_l = loaded(qp_a, qv, ct, None, zero_pl)
    _, qv_h = loaded(qp_a, qv, ct, None, heavy)
    dv_l = np.abs(np.asarray(qv_l)[:6] - np.asarray(qv)[:6]).mean()
    dv_h = np.abs(np.asarray(qv_h)[:6] - np.asarray(qv)[:6]).mean()
    assert dv_h < dv_l


def test_mini_payload_aware_mppi_solve():
    """make_solver(with_payload=True): payload=0 must reproduce the
    payload-less solver bit-for-bit (same keys); a heavy payload must
    change the plan — the controller plans WITH the load it carries."""
    import opendog_tpu.ops.pallas_step as ps
    from opendog_tpu.solvers import MPPIConfig, costs, mppi

    m = load_mini()
    home_j = np.asarray(m.key_qpos[0])[7:]
    cost = costs.standing_cost(m, 0.115, home_j)
    cfg = MPPIConfig(engine="pallas", horizon=4, num_samples=8,
                     n_substeps=1, rollout_dt=0.004)
    s0 = make_state(m, "home")
    key = jax.random.PRNGKey(2)
    orig = ps.build_pallas_substep
    try:
        ps.build_pallas_substep = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        base = mppi.make_solver(m, cost, cfg)
        pay = mppi.make_solver(m, cost, cfg, with_payload=True)
        ms = mppi.init_state(m, cfg)
        c0, _, s_base = jax.jit(base)(s0, ms, key)
        cz, _, s_zero = jax.jit(pay)(s0, ms, key, jnp.float32(0.0))
        ch, _, s_heavy = jax.jit(pay)(s0, ms, key, jnp.float32(2.0))
    finally:
        ps.build_pallas_substep = orig
    np.testing.assert_allclose(np.asarray(cz), np.asarray(c0),
                               rtol=1e-6, atol=1e-6)
    assert np.isfinite(np.asarray(ch)).all()
    # a 2 kg load on a 1.24 kg robot must change the chosen plan costs
    assert abs(float(s_heavy["best_cost"]) - float(s_zero["best_cost"])) \
        > 1e-3

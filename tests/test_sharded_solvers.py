"""N-device == 1-device equivalence for the sharded MPC solver paths:

* sample-sharded MPPI (``mppi.make_solver(..., mesh=)``): K rollout samples
  shard over the mesh, softmax-weighted update reduced with psum/pmin;
* horizon-sharded associative Riccati (``ilqr.sharded_suffix_scan`` /
  ``make_ilqr(..., mesh=)``): blocked suffix scan with an all_gather block
  exchange.

These are the BASELINE.json "reductions ride ICI collectives" requirements
(VERDICT r1 item 1); on the test host the mesh is 8 virtual CPU devices.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from opendog_tpu.assets import load_opendog
from opendog_tpu.physics import make_state
from opendog_tpu.solvers import MPPIConfig, costs, mppi
from opendog_tpu.solvers import ilqr as ilqr_mod


def _mesh(n, axis):
    return Mesh(np.array(jax.devices()[:n]), axis_names=(axis,))


def test_sharded_mppi_matches_single_device(devices8):
    """8-device sample-sharded MPPI must reproduce the single-device solve
    (same per-sample noise keys; reductions differ only in fp order)."""
    m = load_opendog("flat")
    cost = costs.standing_cost(m, 0.0694, np.asarray(m.key_qpos[0])[7:])
    cfg = MPPIConfig(horizon=4, num_samples=32, n_substeps=1,
                     rollout_dt=0.01, noise_sigma=0.1, temperature=0.3)
    state = make_state(m, "home")
    key = jax.random.PRNGKey(7)

    solve1 = jax.jit(mppi.make_solver(m, cost, cfg))
    ms = mppi.init_state(m, cfg)
    ctrl1, next1, stats1 = solve1(state, ms, key)

    mesh = _mesh(8, "mp")
    solveN = jax.jit(mppi.make_solver(m, cost, cfg, mesh=mesh))
    ctrlN, nextN, statsN = solveN(state, ms, key)

    np.testing.assert_allclose(np.asarray(ctrlN), np.asarray(ctrl1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nextN.nominal),
                               np.asarray(next1.nominal),
                               rtol=1e-5, atol=1e-5)
    for k in ("best_cost", "mean_cost", "ess"):
        np.testing.assert_allclose(float(statsN[k]), float(stats1[k]),
                                   rtol=1e-4, atol=1e-4)


def test_sharded_mppi_multi_tick_stays_consistent(devices8):
    """Receding-horizon consistency: several sharded solves in sequence
    track the single-device solver's plan."""
    m = load_opendog("flat")
    cost = costs.standing_cost(m, 0.0694, np.asarray(m.key_qpos[0])[7:])
    cfg = MPPIConfig(horizon=3, num_samples=16, n_substeps=1,
                     rollout_dt=0.01)
    state = make_state(m, "home")
    mesh = _mesh(8, "mp")
    solve1 = jax.jit(mppi.make_solver(m, cost, cfg))
    solveN = jax.jit(mppi.make_solver(m, cost, cfg, mesh=mesh))
    ms1 = msN = mppi.init_state(m, cfg)
    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, sub = jax.random.split(key)
        c1, ms1, _ = solve1(state, ms1, sub)
        cN, msN, _ = solveN(state, msN, sub)
        np.testing.assert_allclose(np.asarray(cN), np.asarray(c1),
                                   rtol=1e-4, atol=1e-4)


def test_sharded_mppi_pergeom_terrain_matches_single_device(devices8):
    """The terrain + per-geom-plane pallas path shards like the flat one:
    8-device == 1-device (mini model, interpret kernels, linear ramp)."""
    import opendog_tpu.ops.pallas_step as ps
    from opendog_tpu.assets import load_mini
    from opendog_tpu.physics import Terrain

    m = load_mini().replace(
        hfield_size=jnp.asarray([2.0, 2.0, 1.0, 0.0], jnp.float32))
    xs = np.linspace(-2.0, 2.0, 9, dtype=np.float32)
    terr = Terrain(height=jnp.asarray(np.tile(0.05 * xs[None, :], (9, 1))))
    cost = costs.standing_cost(m, 0.115, np.asarray(m.key_qpos[0])[7:])
    cfg = MPPIConfig(horizon=3, num_samples=16, n_substeps=1,
                     rollout_dt=0.004, noise_sigma=0.05, engine="pallas")
    state = make_state(m, "home")
    key = jax.random.PRNGKey(3)
    ms = mppi.init_state(m, cfg)
    orig = ps.build_pallas_substep
    try:
        ps.build_pallas_substep = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        solve1 = jax.jit(mppi.make_solver(m, cost, cfg, terrain=terr,
                                          plane_mode="per_geom"))
        ctrl1, next1, stats1 = solve1(state, ms, key)
        mesh = _mesh(8, "mp")
        solveN = jax.jit(mppi.make_solver(m, cost, cfg, terrain=terr,
                                          plane_mode="per_geom", mesh=mesh))
        ctrlN, nextN, statsN = solveN(state, ms, key)
    finally:
        ps.build_pallas_substep = orig
    np.testing.assert_allclose(np.asarray(ctrlN), np.asarray(ctrl1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nextN.nominal),
                               np.asarray(next1.nominal),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(statsN["best_cost"]),
                               float(stats1["best_cost"]),
                               rtol=1e-4, atol=1e-4)


def _random_vf_elems(key, L, nx):
    """Random (F, c, C, eta, J) blocks with SPD C/J so the compositions
    stay well-conditioned."""
    ks = jax.random.split(key, 5)
    F = jax.random.normal(ks[0], (L, nx, nx)) * 0.3 + jnp.eye(nx)[None]
    c = jax.random.normal(ks[1], (L, nx)) * 0.3
    Wc = jax.random.normal(ks[2], (L, nx, nx)) * 0.2
    C = jnp.einsum("hij,hkj->hik", Wc, Wc)
    eta = jax.random.normal(ks[3], (L, nx)) * 0.3
    Wj = jax.random.normal(ks[4], (L, nx, nx)) * 0.2
    J = jnp.einsum("hij,hkj->hik", Wj, Wj)
    return (F, c, C, eta, J)


def test_sharded_suffix_scan_matches_single_device(devices8):
    """The blocked shard_map suffix scan == plain associative_scan, both
    for a divisible length and one that needs identity padding."""
    mesh = _mesh(8, "sp")
    for L in (16, 13):  # 16 divides 8; 13 exercises the padding path
        elems = _random_vf_elems(jax.random.PRNGKey(L), L, 5)
        ref = jax.jit(ilqr_mod._suffix_scan)(elems)
        shd = jax.jit(
            lambda e: ilqr_mod.sharded_suffix_scan(e, mesh, "sp")
        )(elems)
        for r, s in zip(ref, shd):
            np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)


def test_sharded_associative_gains_match(devices8):
    """Full gains path: horizon-sharded associative_lqr_gains == unsharded
    == (already covered) sequential recursion."""
    from tests.test_ilqr import _random_lqr

    mesh = _mesh(8, "sp")
    A, B, lx, lu, lxx, luu, lux, vx, vxx = _random_lqr(
        jax.random.PRNGKey(3), H=24, nx=6, nu=3)
    k1, K1, dV1 = jax.jit(ilqr_mod.associative_lqr_gains)(
        A, B, lx, lu, lxx, luu, lux, vx, vxx, 1e-9)
    kN, KN, dVN = jax.jit(
        lambda *a: ilqr_mod.associative_lqr_gains(
            *a, 1e-9, mesh=mesh, horizon_axis="sp")
    )(A, B, lx, lu, lxx, luu, lux, vx, vxx)
    np.testing.assert_allclose(np.asarray(kN), np.asarray(k1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(KN), np.asarray(K1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dVN), np.asarray(dV1),
                               rtol=1e-4, atol=1e-4)


def test_ilqr_horizon_sharded_solve(devices8):
    """End-to-end iLQR with the horizon-sharded Riccati: improves the plan
    and matches the unsharded associative solve."""
    m = load_opendog("flat")
    cost = costs.standing_cost(m, 0.0694, np.asarray(m.key_qpos[0])[7:])
    cfg = ilqr_mod.ILQRConfig(horizon=8, n_substeps=1, rollout_dt=0.004,
                              iterations=1, riccati="associative")
    state = make_state(m, "home")
    U0 = jnp.tile(jnp.asarray(m.key_ctrl[0])[None], (cfg.horizon, 1))

    solve1 = jax.jit(ilqr_mod.make_ilqr(m, cost, cfg))
    U1, X1, s1 = solve1(state, U0)

    mesh = _mesh(8, "sp")
    solveN = jax.jit(ilqr_mod.make_ilqr(m, cost, cfg, mesh=mesh))
    UN, XN, sN = solveN(state, U0)

    assert float(s1["cost"]) <= float(s1["initial_cost"]) + 1e-3
    np.testing.assert_allclose(np.asarray(UN), np.asarray(U1),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(float(sN["cost"]), float(s1["cost"]),
                               rtol=1e-4, atol=1e-4)

import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.assets import load_opendog
from opendog_tpu.physics import make_state
from opendog_tpu.solvers import costs
from opendog_tpu.solvers.ilqr import ILQRConfig, make_ilqr


def _random_lqr(key, H=12, nx=6, nu=3):
    ks = jax.random.split(key, 8)
    A = jax.random.normal(ks[0], (H, nx, nx)) * 0.3 + jnp.eye(nx)[None]
    B = jax.random.normal(ks[1], (H, nx, nu)) * 0.3
    lx = jax.random.normal(ks[2], (H, nx))
    lu = jax.random.normal(ks[3], (H, nu)) * 0.1
    W = jax.random.normal(ks[4], (H, nx, nx)) * 0.3
    lxx = jnp.einsum("hij,hkj->hik", W, W) + jnp.eye(nx)[None]
    Wu = jax.random.normal(ks[5], (H, nu, nu)) * 0.3
    luu = jnp.einsum("hij,hkj->hik", Wu, Wu) + jnp.eye(nu)[None]
    lux = jax.random.normal(ks[6], (H, nu, nx)) * 0.1
    vx = jax.random.normal(ks[7], (nx,))
    vxx = jnp.eye(nx) * 2.0
    return A, B, lx, lu, lxx, luu, lux, vx, vxx


def test_associative_riccati_matches_sequential():
    """The O(log H) associative backward pass must reproduce the classic
    sequential Riccati recursion's gains on a random LQR problem."""
    m = load_opendog("flat")  # only used to build the solver closure
    cost = costs.standing_cost(m, 0.0694, np.asarray(m.key_qpos[0])[7:])
    # access the backward passes through a tiny solver instance
    from opendog_tpu.solvers import ilqr as ilqr_mod

    cfg = ILQRConfig(horizon=4, iterations=1)
    # build closures with matching nx/nu by monkey-free direct call:
    # reconstruct the two functions via make_ilqr internals is awkward;
    # instead test on synthetic dims by re-deriving from the module-level
    # math: run both passes through a crafted instance.
    nx, nu = 6, 3
    A, B, lx, lu, lxx, luu, lux, vx, vxx = _random_lqr(jax.random.PRNGKey(0),
                                                       nx=nx, nu=nu)

    # sequential reference implementation (mirrors backward_scan)
    def seq(A, B, lx, lu, lxx, luu, lux, vx, vxx, reg):
        H = A.shape[0]
        Vx, Vxx = vx, vxx
        ks, Ks = [], []
        for t in reversed(range(H)):
            Qx = lx[t] + A[t].T @ Vx
            Qu = lu[t] + B[t].T @ Vx
            Qxx = lxx[t] + A[t].T @ Vxx @ A[t]
            Quu = luu[t] + B[t].T @ Vxx @ B[t] + reg * jnp.eye(nu)
            Qux = lux[t] + B[t].T @ Vxx @ A[t]
            k = -jnp.linalg.solve(Quu, Qu)
            K = -jnp.linalg.solve(Quu, Qux)
            Vx = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx = 0.5 * (Vxx + Vxx.T)
            ks.append(k)
            Ks.append(K)
        return jnp.stack(ks[::-1]), jnp.stack(Ks[::-1])

    k_seq, K_seq = seq(A, B, lx, lu, lxx, luu, lux, vx, vxx, 1e-9)

    # associative implementation extracted via a solver instance with the
    # right dims: build a dummy make_ilqr on a model with nx=nq+nv... the
    # pass itself only uses shapes, so call the inner function through a
    # small shim:
    shim = ilqr_mod.make_ilqr(
        m, cost, ILQRConfig(horizon=4, riccati="associative")
    )
    # the backward functions are closures; re-derive via public solve is
    # expensive — instead, duplicate the associative math through the
    # module by invoking the standalone helper:
    k_par, K_par, _ = ilqr_mod.associative_lqr_gains(
        A, B, lx, lu, lxx, luu, lux, vx, vxx, 1e-9
    )
    np.testing.assert_allclose(np.asarray(k_par), np.asarray(k_seq),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(K_par), np.asarray(K_seq),
                               rtol=2e-3, atol=2e-3)


def test_ilqr_reduces_standing_cost():
    """iLQR must substantially improve a deliberately bad initial plan
    (ctrlrange-midpoint targets) toward the home posture the cost wants."""
    m = load_opendog("flat")
    cost = costs.standing_cost(m, 0.0694, np.asarray(m.key_qpos[0])[7:])
    cfg = ILQRConfig(horizon=12, n_substeps=2, rollout_dt=0.005,
                     iterations=6)
    solve = jax.jit(make_ilqr(m, cost, cfg))
    state = make_state(m, "home")
    cr = np.asarray(m.actuator_ctrlrange)
    U0 = jnp.tile(jnp.asarray(0.5 * (cr[:, 0] + cr[:, 1]),
                              jnp.float32)[None], (cfg.horizon, 1))
    U, X, stats = solve(state, U0)
    # the robot is weakly actuated (forcerange ±0.83 N·m) so most of the
    # cost is unavoidable over 0.12 s; require a clear, strict improvement
    assert float(stats["cost"]) < float(stats["initial_cost"]) - 0.3
    assert np.all(np.isfinite(np.asarray(U)))
    # the optimised knee targets should move from midpoint (-1.5) toward
    # home (-1.5708)
    home_ctrl = np.asarray(m.key_ctrl[0])
    assert (
        np.abs(np.asarray(U[0]) - home_ctrl).mean()
        < np.abs(np.asarray(U0[0]) - home_ctrl).mean()
    )


def test_ilqr_associative_mode_runs():
    m = load_opendog("flat")
    cost = costs.standing_cost(m, 0.0694, np.asarray(m.key_qpos[0])[7:])
    cfg = ILQRConfig(horizon=8, n_substeps=2, rollout_dt=0.004,
                     iterations=3, riccati="associative")
    solve = jax.jit(make_ilqr(m, cost, cfg))
    state = make_state(m, "home")
    U0 = jnp.tile(jnp.asarray(m.key_ctrl[0])[None], (cfg.horizon, 1))
    U, X, stats = solve(state, U0)
    assert float(stats["cost"]) <= float(stats["initial_cost"]) + 1e-3
    assert np.all(np.isfinite(np.asarray(U)))

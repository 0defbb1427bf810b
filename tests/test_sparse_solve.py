import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.assets import load_go1, load_opendog
from opendog_tpu.physics import dynamics, make_state


def _random_arrow_spd(model, key, batch=3):
    """Random SPD matrix with the model's tree sparsity."""
    nv = model.nv
    mask = dynamics._dof_ancestor_matrix(model)
    mask = np.maximum(mask, mask.T) + np.eye(nv)
    mask = (mask > 0).astype(np.float32)
    W = jax.random.normal(key, (batch, nv, nv))
    A = jnp.einsum("bij,bkj->bik", W, W) + 10.0 * jnp.eye(nv)
    return A * mask[None]


def test_arrow_structure_detected():
    go1 = load_go1("flat")
    s = dynamics._arrow_structure(go1)
    assert s is not None
    base, chains = s
    assert chains.shape == (4, 3)
    od = load_opendog("flat")
    base, chains = dynamics._arrow_structure(od)
    assert chains.shape == (4, 2)


def test_arrow_solve_matches_dense():
    for loader in (load_go1, load_opendog):
        m = loader("flat")
        A = _random_arrow_spd(m, jax.random.PRNGKey(0))
        b = jax.random.normal(jax.random.PRNGKey(1), (3, m.nv))
        x = dynamics.arrow_solve(m, A, b)
        want = jnp.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), np.asarray(want),
                                   rtol=2e-3, atol=2e-4)


def test_tree_solve_matches_dense():
    m = load_go1("flat")
    A = _random_arrow_spd(m, jax.random.PRNGKey(2), batch=1)[0]
    b = jax.random.normal(jax.random.PRNGKey(3), (m.nv,))
    x = dynamics.tree_solve(m, A, b)
    want = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want),
                               rtol=2e-3, atol=2e-4)


def test_forward_with_arrow_solve_matches_golden():
    """The settle trajectory must still match the MuJoCo golden after the
    sparse-solve swap (regression on the solver change)."""
    gold = np.load("tests/golden/go1_settle.npz")["qpos"]
    m = load_go1("flat")
    state = make_state(m, "home")
    ctrl = jnp.asarray(m.key_ctrl[0])
    step = jax.jit(lambda s: dynamics.step(m, s, ctrl, n_substeps=10))
    for _ in range(50):
        state, _ = step(state)
    np.testing.assert_allclose(np.asarray(state.qpos[7:]), gold[-1][7:],
                               atol=1e-2)
    assert abs(float(state.qpos[2]) - gold[-1][2]) < 3e-3

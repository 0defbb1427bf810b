import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.assets import load_opendog
from opendog_tpu.physics import make_state
from opendog_tpu.solvers import costs
from opendog_tpu.solvers.ilqr import ILQRConfig
from opendog_tpu.solvers.mpc import make_ilqr_tracker


def test_ilqr_replan_track_cycle():
    """BASELINE config 3 (miniaturised): slow replan + fast LQR tracking
    keeps the standing robot upright through a full cycle."""
    m = load_opendog("flat")
    cost = costs.standing_cost(m, 0.0694, np.asarray(m.key_qpos[0])[7:])
    cfg = ILQRConfig(horizon=8, n_substeps=2, rollout_dt=0.005,
                     iterations=3)
    cycle = jax.jit(make_ilqr_tracker(m, cost, cfg, track_ticks=6,
                                      plant_substeps=5))
    from opendog_tpu.physics import dynamics

    state = make_state(m, "home")
    # settle onto the ground first so the tracked window starts standing
    state, _ = dynamics.step(m, state, jnp.asarray(m.key_ctrl[0]), None,
                             n_substeps=200)
    state = state.replace(qvel=state.qvel.at[0].set(0.2))
    U0 = jnp.tile(jnp.asarray(m.key_ctrl[0])[None], (cfg.horizon, 1))
    plant, U_next, traj = cycle(state, U0)
    z = np.asarray(traj["qpos"])[:, 2]
    assert np.all(np.isfinite(z))
    assert z.min() > 0.04 and z.max() < 0.12  # stayed in the healthy band
    assert U_next.shape == U0.shape
    # controls stayed inside the ctrlrange
    cr = np.asarray(m.actuator_ctrlrange)
    ctrl = np.asarray(traj["ctrl"])
    assert np.all(ctrl >= cr[:, 0] - 1e-5) and np.all(ctrl <= cr[:, 1] + 1e-5)

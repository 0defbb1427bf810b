"""MPC -> policy distillation (DAgger) round.

Reference deploys either trained policies or scripted gaits
(sim2real/train.py, quadpilot/run_policy.py); the distiller adds the
MPC-expert labeling loop on top of the same MPPI solver and network stack.
"""
import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.assets import load_opendog
from opendog_tpu.physics import State, make_state
from opendog_tpu.rl.distill import DistillConfig, make_distiller
from opendog_tpu.rl.networks import MLPActorCritic
from opendog_tpu.solvers import MPPIConfig, costs


def test_distill_round_trains_student():
    m = load_opendog("flat")
    home_joints = np.asarray(m.key_qpos[0])[7:]
    cost = costs.standing_cost(m, 0.065, home_joints)
    obs_fn = lambda qp, qv, t: jnp.concatenate([qp[2:], qv])
    net = MLPActorCritic(action_dim=m.nu, hidden=(32, 32))
    dcfg = DistillConfig(num_scenarios=2, rollout_ticks=3, rounds=1,
                         batch_size=4, epochs_per_round=2)
    mcfg = MPPIConfig(horizon=4, num_samples=8, n_substeps=1,
                      rollout_dt=0.01)
    init, round_fn, eval_fn, _, _ = make_distiller(m, cost, obs_fn, net,
                                    mppi_config=mcfg, config=dcfg,
                                    plant_substeps=2)
    s0 = make_state(m, "home")
    plants = State(
        qpos=jnp.tile(s0.qpos[None], (2, 1)),
        qvel=jnp.zeros((2, m.nv)),
        time=jnp.zeros(2),
    )
    dstate = init(jax.random.PRNGKey(0), s0)
    before = jax.tree.leaves(dstate.params)[0].copy()
    dstate, plants, metrics = jax.jit(round_fn, static_argnums=2)(
        dstate, plants, 0)
    assert np.isfinite(float(metrics["distill_loss"]))
    assert float(metrics["beta"]) == 1.0
    after = jax.tree.leaves(dstate.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_distill_eval_rollout_reports_rmse_and_trajectory():
    """eval_fn: student-only rollout with on-trajectory expert labeling —
    the proof harness for the distilled policy (BASELINE config 5)."""
    m = load_opendog("flat")
    home_joints = np.asarray(m.key_qpos[0])[7:]
    cost = costs.standing_cost(m, 0.065, home_joints)
    obs_fn = lambda qp, qv, t: jnp.concatenate([qp[2:], qv])
    net = MLPActorCritic(action_dim=m.nu, hidden=(16, 16))
    dcfg = DistillConfig(num_scenarios=2, rollout_ticks=2, batch_size=4,
                         epochs_per_round=1)
    mcfg = MPPIConfig(horizon=3, num_samples=8, n_substeps=1,
                      rollout_dt=0.01)
    init, round_fn, eval_fn, _, _ = make_distiller(m, cost, obs_fn, net,
                                             mppi_config=mcfg, config=dcfg,
                                             plant_substeps=2)
    s0 = make_state(m, "home")
    plants = State(qpos=jnp.tile(s0.qpos[None], (2, 1)),
                   qvel=jnp.zeros((2, m.nv)), time=jnp.zeros(2))
    dstate = init(jax.random.PRNGKey(0), s0)
    out = jax.jit(eval_fn, static_argnums=2)(dstate, plants, 4)
    assert out["qpos_traj"].shape == (4, 2, m.nq)
    assert np.isfinite(float(out["action_rmse"]))
    assert out["final_x"].shape == (2,)
    # student actions are clipped into ctrlrange by construction
    rng = np.asarray(m.actuator_ctrlrange)
    assert np.all(np.isfinite(np.asarray(out["final_z"])))


def test_walking_student_artifact_drives_plant_forward():
    """The committed go1 student (runs/distill_go1/student.msgpack, the
    MPC-distilled walking policy) must drive the op-graph plant forward
    upright for 100 ticks (2 s) on CPU.  CPU f32 op-graph is the accuracy
    ground truth the fused training plant matches to ~3e-6, so this is a
    fair cross-engine check of the artifact."""
    import os

    from opendog_tpu.physics import dynamics
    from opendog_tpu.rl.distill_zoo import load_student, trot_distill_setup

    path = "runs/distill_go1/student.msgpack"
    if not os.path.exists(path):
        import pytest
        pytest.skip("student artifact not present")
    setup = trot_distill_setup("go1")
    m = setup.model
    policy = load_student(path, setup)
    st = make_state(m, "home")
    lo, hi = np.asarray(m.actuator_ctrlrange).T
    prev = jnp.asarray(np.clip(np.asarray(m.key_ctrl[0], np.float32),
                               lo, hi))
    jpol = jax.jit(policy)
    jstep = jax.jit(lambda s, c: dynamics.step(m, s, c,
                                               n_substeps=10)[0])
    zs = []
    for t in range(100):
        u = jpol(st.qpos, st.qvel, st.time, prev)
        st = jstep(st, u)
        prev = u
        zs.append(float(st.qpos[2]))
    assert np.isfinite(np.asarray(zs)).all()
    assert min(zs) > 0.12 and max(zs) < 0.45, (min(zs), max(zs))
    assert float(st.qpos[0]) > 0.15, float(st.qpos[0])  # ~0.3 m expected


def test_payload_randomized_dagger_round():
    """payload_range DAgger: expert plans and plant integrates each
    scenario's carried load on the kernel's payload lanes; the student
    does not observe it (mini model, interpret kernels)."""
    import opendog_tpu.ops.pallas_step as ps
    from opendog_tpu.assets import load_mini

    m = load_mini()
    home_joints = np.asarray(m.key_qpos[0])[7:]
    cost = costs.standing_cost(m, 0.115, home_joints)
    obs_fn = lambda qp, qv, t: jnp.concatenate([qp[2:], qv])
    net = MLPActorCritic(action_dim=m.nu, hidden=(16, 16),
                         squash_mean=False)
    dcfg = DistillConfig(num_scenarios=2, rollout_ticks=2, batch_size=4,
                         epochs_per_round=1)
    mcfg = MPPIConfig(horizon=3, num_samples=8, n_substeps=1,
                      rollout_dt=0.004, engine="pallas")
    orig = ps.build_pallas_substep
    try:
        ps.build_pallas_substep = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        init, round_fn, eval_fn, _, _ = make_distiller(
            m, cost, obs_fn, net, mppi_config=mcfg, config=dcfg,
            plant_substeps=2, payload_range=(0.0, 1.0))
        s0 = make_state(m, "home")
        plants = State(qpos=jnp.tile(s0.qpos[None], (2, 1)),
                       qvel=jnp.zeros((2, m.nv)), time=jnp.zeros(2))
        payloads = jnp.array([0.0, 1.0])
        dstate = init(jax.random.PRNGKey(0), s0)
        dstate, plants2, metrics = jax.jit(round_fn, static_argnums=2)(
            dstate, plants, 0, payloads)
        assert np.isfinite(float(metrics["distill_loss"]))
        out = jax.jit(eval_fn, static_argnums=2)(dstate, plants, 3,
                                                 payloads)
        assert np.isfinite(np.asarray(out["qpos_traj"])).all()
        # the loaded scenario must settle differently from the unloaded
        dq = np.abs(np.asarray(plants2.qpos[0]) -
                    np.asarray(plants2.qpos[1]))
        assert dq.max() > 1e-5
    finally:
        ps.build_pallas_substep = orig


def test_committed_student_recipe_matches_zoo_defaults():
    """A committed student.msgpack deploys as ``net(obs) + u_ref``; if the
    zoo's default recipe drifts from the one the artifact was trained
    against, every deployed action is silently offset.  Pin the recipe
    recorded in the run's metrics.json against the current defaults
    (artifacts from before recipe recording are skipped)."""
    import json
    import os

    import pytest

    from opendog_tpu.rl.distill_zoo import (
        normalize_recipe, trot_distill_setup,
    )

    root = os.path.join(os.path.dirname(__file__), "..", "runs")
    checked = 0
    for robot in ("go1", "opendog"):
        path = os.path.join(root, f"distill_{robot}", "metrics.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            rec = json.load(f).get("recipe")
        if rec is None:
            continue  # pre-recipe artifact
        # absent-field == NamedTuple-default (purely additive schema
        # growth, e.g. amp_knots added in r5); real drift still fails
        rec = normalize_recipe(rec)
        current = normalize_recipe(trot_distill_setup(robot).recipe)
        assert rec == current, (
            f"runs/distill_{robot} was trained with a different recipe "
            f"than the current zoo defaults — retrain or restore:\n"
            f"artifact: {rec}\ncurrent:  {current}")
        checked += 1
    if not checked:
        pytest.skip("no committed artifacts carry a recipe yet")


def test_committed_cmd_student_recipe_matches_zoo_defaults():
    """Same pin for every committed command-conditioned student: each
    artifact's recipe is cmd_distill_setup's for its robot plus the
    script-recorded extras (anchor_w, payload_range —
    scripts/distill_cmd.py)."""
    import json
    import os

    import pytest

    from opendog_tpu.rl.distill_zoo import (
        cmd_distill_setup, normalize_recipe,
    )

    root = os.path.join(os.path.dirname(__file__), "..", "runs")
    checked = 0
    for run in ("distill_cmd", "distill_cmd_payload",
                "distill_cmd_opendog"):
        path = os.path.join(root, run, "metrics.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            rec = json.load(f)["recipe"]
        assert rec.get("anchor_w") is not None, \
            f"{run} artifact must record anchor_w"
        extras = {k: rec[k] for k in ("anchor_w", "payload_range")
                  if k in rec}
        rec = normalize_recipe(rec)
        current = normalize_recipe(
            dict(cmd_distill_setup(rec["robot"]).recipe, **extras))
        assert rec == current, (
            f"runs/{run} was trained with a different recipe than the "
            f"current zoo defaults — retrain or restore:\n"
            f"artifact: {rec}\ncurrent:  {current}")
        checked += 1
    if not checked:
        pytest.skip("no committed command-student artifacts")


def test_committed_cmd_student_deploys():
    """The committed command-conditioned student restores through
    load_student(command_dim=3) and emits finite in-range actions that
    RESPOND to the command (stand vs trot differ)."""
    import os

    import numpy as np
    import jax.numpy as jnp
    import pytest

    from opendog_tpu.rl.distill_zoo import cmd_distill_setup, load_student

    path = os.path.join(os.path.dirname(__file__), "..", "runs",
                        "distill_cmd", "student.msgpack")
    if not os.path.exists(path):
        pytest.skip("no committed command-student artifact")
    setup = cmd_distill_setup("go1")
    m = setup.model
    policy = load_student(path, setup, command_dim=3)
    qpos = jnp.asarray(m.key_qpos[0])
    qvel = jnp.zeros(m.nv)
    prev = jnp.asarray(m.key_ctrl[0])
    lo, hi = np.asarray(m.actuator_ctrlrange).T
    u_stand = np.asarray(policy(qpos, qvel, 0.1, prev, jnp.zeros(3)))
    u_trot = np.asarray(policy(qpos, qvel, 0.1, prev,
                               jnp.array([0.5, 0.0, 0.0])))
    for u in (u_stand, u_trot):
        assert np.isfinite(u).all()
        assert (u >= lo - 1e-6).all() and (u <= hi + 1e-6).all()
    assert np.abs(u_stand - u_trot).max() > 0.02

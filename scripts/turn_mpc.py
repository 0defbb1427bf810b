#!/usr/bin/env python
"""MPC turn-while-trotting — the TurnEnvironment task via the solver stack.

TrotCostParams.desired_yaw steers the trot toward a commanded heading
(45 deg here) while tracking a diagonal velocity command; the wrap-safe
yaw error avoids the 2*pi cliff.  Measured: yaw reaches the target within
~0.5 s and holds while the robot trots along the new heading, upright
(runs/turn_mpc/metrics.json; runs on TPU with the fused kernel, or CPU
with engine='xla').
"""
import json
import numpy as np
import jax, jax.numpy as jnp
from opendog_tpu.assets import load_go1
from opendog_tpu.physics import make_state, spatial
from opendog_tpu.solvers import MPPIConfig, costs, make_mpc

m = load_go1("flat")
hj = np.asarray(m.key_qpos[0])[7:]
p = costs.TrotCostParams(desired_vel_xy=(0.25, 0.25), target_height=0.265,
                         desired_yaw=np.pi / 4, w_heading=10.0,
                         w_yaw_rate=0.5)
cost = costs.trot_cost(m, p, hj, legs="go1")
cfg = MPPIConfig(horizon=25, num_samples=256, n_substeps=2,
                 rollout_dt=0.01, noise_sigma=0.12, temperature=0.3,
                 engine="pallas" if __import__("jax").default_backend() != "cpu" else "xla")
init, tick, run = make_mpc(m, cost, cfg, plant_substeps=10)
carry = init(jax.random.PRNGKey(0), make_state(m, "home"))
jrun = jax.jit(lambda c: run(c, 250))
carry, traj = jrun(carry)
q = np.asarray(traj["qpos"])
yaw = np.array([float(spatial.euler_from_quat(jnp.asarray(qq[3:7]))[2])
                for qq in q[::25]])
final = q[-1]
r, pch, y = np.asarray(spatial.euler_from_quat(jnp.asarray(final[3:7])))
res = dict(ticks=250, yaw_target_deg=45.0,
           final_yaw_deg=round(float(np.degrees(y)), 1),
           yaw_traj_deg=[round(float(np.degrees(v)), 1) for v in yaw],
           final_xy=[round(float(final[0]), 2), round(float(final[1]), 2)],
           trunk_z=round(float(final[2]), 3),
           upright=bool(abs(r) < 0.3 and abs(pch) < 0.3),
           all_finite=bool(np.isfinite(q).all()))
print(json.dumps(res), flush=True)
import os
os.makedirs("runs/turn_mpc", exist_ok=True)
json.dump(res, open("runs/turn_mpc/metrics.json", "w"), indent=2)
from opendog_tpu.physics import State
from opendog_tpu.utils.render import record_rollout
states = State(qpos=jnp.asarray(q[::4]),
               qvel=jnp.zeros((q[::4].shape[0], m.nv)),
               time=jnp.zeros(q[::4].shape[0]))
record_rollout(m, states, "runs/turn_mpc/turn.gif", fps=12, plane="xz")
print("wrote turn.gif", flush=True)

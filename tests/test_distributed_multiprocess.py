"""Multi-process ``jax.distributed`` test (SURVEY §4: "multi-host tests
using JAX's multi-process simulation on one host").

Two OS processes, each owning 2 virtual CPU devices, bring up the
distributed runtime through ``parallel.initialize_distributed`` (the same
entry the pod-slice path uses), build a global 4-device mesh, and run a
shard_map psum whose result every process checks against the closed form.
This is the DCN-analog coverage the single-process 8-device conftest mesh
cannot provide: cross-process collectives and global-array semantics.
"""
import os
import socket
import subprocess
import sys


_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opendog_tpu.parallel import initialize_distributed

coord, pid = sys.argv[1], int(sys.argv[2])
assert initialize_distributed(coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())  # 2 local x 2 procs

mesh = Mesh(np.array(jax.devices()), axis_names=("dp",))
# global arange(4*3) sharded over dp: each process contributes its local
# shard, jax assembles the global array
sharding = NamedSharding(mesh, P("dp"))
global_shape = (4, 3)
full = np.arange(12, dtype=np.float32).reshape(global_shape)
local_arrays = [
    jax.device_put(full[idx], d)
    for d, idx in sharding.addressable_devices_indices_map(
        global_shape).items()
]
x = jax.make_array_from_single_device_arrays(
    global_shape, sharding, local_arrays)

def body(xs):
    return jax.lax.psum(jnp.sum(xs), "dp")

total = jax.jit(shard_map(body, mesh=mesh, in_specs=(P("dp"),),
                          out_specs=P()))(x)
# fully-replicated scalar: addressable on every process
val = float(np.asarray(total.addressable_data(0)))
assert abs(val - float(full.sum())) < 1e-5, val
print(f"proc {pid} psum OK: {val}", flush=True)
jax.distributed.shutdown()
"""


_MPPI_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opendog_tpu.assets import load_opendog
from opendog_tpu.parallel import initialize_distributed
from opendog_tpu.physics import make_state
from opendog_tpu.solvers import MPPIConfig, costs, mppi

coord, pid = sys.argv[1], int(sys.argv[2])
assert initialize_distributed(coord, num_processes=2, process_id=pid)
assert len(jax.devices()) == 4

m = load_opendog("flat")
cost = costs.standing_cost(
    m, target_height=0.0694, home_joint_qpos=np.asarray(m.key_qpos[0])[7:])
cfg = MPPIConfig(horizon=4, num_samples=16, n_substeps=1,
                 rollout_dt=0.01, noise_sigma=0.05)

mesh = Mesh(np.array(jax.devices()), axis_names=("mp",))
rep = NamedSharding(mesh, P())

def replicated(x):
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

solve_sharded = mppi.make_solver(m, cost, cfg, mesh=mesh)
state = jax.tree.map(replicated, make_state(m, "home"))
ms = jax.tree.map(replicated, mppi.init_state(m, cfg))
key = replicated(jax.random.PRNGKey(0))
ctrl, ms2, stats = jax.jit(solve_sharded)(state, ms, key)
ctrl = np.asarray(ctrl.addressable_data(0))
nom2 = np.asarray(ms2.nominal.addressable_data(0))
best = float(np.asarray(stats["best_cost"].addressable_data(0)))

# reference: the plain single-device solver with identical inputs
solve_ref = mppi.make_solver(m, cost, cfg)
ctrl_r, ms_r, stats_r = jax.jit(solve_ref)(
    make_state(m, "home"), mppi.init_state(m, cfg), jax.random.PRNGKey(0))
np.testing.assert_allclose(ctrl, np.asarray(ctrl_r), rtol=2e-4, atol=2e-5)
np.testing.assert_allclose(nom2, np.asarray(ms_r.nominal), rtol=2e-4,
                           atol=2e-5)
assert abs(best - float(stats_r["best_cost"])) < 1e-4
print(f"proc {pid} sharded-MPPI OK: best_cost {best:.4f}", flush=True)
jax.distributed.shutdown()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(tmp_path, worker_src: str, expect: str,
                     timeout_s: float = 220):
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(
        PALLAS_AXON_POOL_IPS="",  # never let workers touch the TPU tunnel
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + env.get("PYTHONPATH", "").split(os.pathsep)),
    )
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(pid)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout_s)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert expect in out, out


def test_two_process_distributed_psum(tmp_path):
    _run_two_process(tmp_path, _WORKER, "psum OK: 66.0")


def test_two_process_sharded_mppi_matches_single_device(tmp_path):
    """VERDICT r2 item 9: the strongest multi-host evidence this
    environment permits — a 2-process x 2-device sample-sharded MPPI solve
    (cross-process psum/pmin in the weighted update) equals the plain
    single-device solve bit-for-tolerance."""
    _run_two_process(tmp_path, _MPPI_WORKER, "sharded-MPPI OK",
                     timeout_s=400)

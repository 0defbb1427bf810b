"""Smoke the MPC demo scripts (jump / landing / turn cost) end-to-end at
tiny scale on CPU — guards the committed artifact pipelines against rot.
Real configs and results: runs/{jump,landing,turn}_mpc/metrics.json."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
           PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))


def _run(script, out_dir, extra=()):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script),
         "--smoke", "--out", str(out_dir), *extra],
        env=ENV, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(os.path.join(out_dir, "metrics.json")) as f:
        return json.load(f)


def test_jump_mpc_smoke(tmp_path):
    res = _run("jump_mpc.py", tmp_path)
    assert res["all_finite"]
    assert res["ticks"] == 3


def test_landing_mpc_smoke(tmp_path):
    res = _run("landing_mpc.py", tmp_path)
    assert res["all_finite"]
    assert res["min_trunk_z"] > 0.0


def test_distill_walk_smoke(tmp_path):
    res = _run("distill_walk.py", tmp_path, extra=("--robot", "go1"))
    assert res["eval_ticks"] == 3
    assert res["rounds"] == 1


def test_lag_sweep_smoke(tmp_path):
    out = os.path.join(tmp_path, "lag.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "lag_sweep.py"),
         "--smoke", "--ticks", "20", "--seeds", "1", "--lags", "0", "3",
         "--out", out],
        env=ENV, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))
    assert res["metric"] == "lag_sweep"
    assert [x["lag"] for x in res["results"]] == [0, 3]
    assert res["final_x_lag3_vs_lag0"] is not None


def test_terrain_fidelity_smoke(tmp_path):
    out = os.path.join(tmp_path, "fid.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "terrain_fidelity.py"),
         "--smoke", "--out", out],
        env=ENV, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))
    assert res["metric"] == "terrain_planning_fidelity"
    assert res["exact"]["success_rate"] == 1.0
    assert res[res["plane_arm"]]["success_rate"] == 1.0


def test_opendog_walk_sweep_smoke(tmp_path):
    out = os.path.join(tmp_path, "sweep.json")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "opendog_walk_sweep.py"),
         "--smoke", "--out", out],
        env=ENV, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))
    assert res["metric"] == "opendog_walk_sweep"
    assert res["best"]["fell"] is False
    assert res["best_final_x"] > 0.0


def test_soak_cmd_smoke(tmp_path):
    """Command-switching soak of the committed student (scripts/
    soak_cmd.py): the deploy path (load_student + plant) must stay
    runnable and finite at tiny scale."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "soak_cmd.py"),
         "--smoke", "--out", str(tmp_path)],
        env=ENV, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(os.path.join(tmp_path, "soak.json")))
    assert res["all_finite"]
    assert res["segments_total"] == 19

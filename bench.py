#!/usr/bin/env python
"""Headline benchmark: MPC solves/sec/chip + p99 solve latency at the 50 Hz
control budget for the 12-DoF quadruped (BASELINE.json metric).

Config matches BASELINE.json config 2: flat-ground trot tracking, MPPI with
256 rollouts and a 0.5 s horizon (25 control steps x 4 substeps x 5 ms
rollout dt), single chip.  The plant advances at the full 2 ms physics rate
(10 substeps per 50 Hz tick).

Prints ONE JSON line:
  {"metric": ..., "value": solves_per_sec, "unit": "solves/s/chip",
   "vs_baseline": value / 50}
vs_baseline is measured against the 50 Hz real-time requirement (the
reference publishes no benchmark numbers — BASELINE.md; its achieved
end-to-end control rate on hardware is 12.5 Hz, sim2real/run_robot.py:37).
Extra fields carry p99 latency and rollout throughput for the record.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


INIT_SENTINEL = "[bench] devices ok:"


def main():
    import jax

    import opendog_tpu  # noqa: F401
    # Persistent XLA compilation cache (VERDICT r4 item 6): the r04 record
    # spent 981 s (41% of the supervisor window) compiling the SAME tick
    # program r03 compiled in ~180 s — remote-compile-service weather.
    # With the cache, every run after the first deserializes the
    # executable from disk instead of re-compiling (measured ~0.02 s
    # client-side; residual first-exec cost is program load).
    from opendog_tpu.utils import compile_cache
    cache_dir = compile_cache.enable()
    cache_entries = len([f for f in os.listdir(cache_dir)
                         if f.endswith("-cache")])
    from opendog_tpu.assets import load_go1
    from opendog_tpu.physics import make_state
    from opendog_tpu.solvers import MPPIConfig, costs, make_mpc

    # First device touch up front: when the axon tunnel is down this HANGS
    # (not errors), so the supervisor watches for this sentinel and kills
    # attempts that don't reach it within the (short) init timeout instead
    # of burning the full run timeout per attempt.
    print(f"{INIT_SENTINEL} {jax.devices()}", file=sys.stderr, flush=True)

    model = load_go1("flat")
    params = costs.TrotCostParams(
        desired_vel_xy=(0.5, 0.0), target_height=0.265
    )
    cost = costs.trot_cost(model, params, np.asarray(model.key_qpos[0])[7:],
                           legs="go1")
    # engine="pallas": the fused TPU substep kernel (ops/pallas_step.py) —
    # 12.5x faster and ~2000x more accurate than the op-graph rollout on
    # TPU v5e (see tests/test_pallas_core.py header for measurements).
    engine = "pallas" if jax.default_backend() != "cpu" else "xla"
    cfg = MPPIConfig(
        horizon=25, num_samples=256, n_substeps=2, rollout_dt=0.01,
        noise_sigma=0.12, temperature=0.3, engine=engine,
    )
    init, tick, run = make_mpc(model, cost, cfg, plant_substeps=10)
    carry = init(jax.random.PRNGKey(0), make_state(model, "home"))

    def log(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    jtick = jax.jit(tick)
    # warmup / compile, split so the record is interpretable (measured on
    # the v5e tunnel, .scratch/cache_probe.py runs 2026-08-20):
    #   * LOWERING is client-side tracing of the ~11 MB tick HLO plus the
    #     one-time axon first-touch — ~115-130 s per process, cache can't
    #     help;
    #   * BACKEND COMPILE is what the persistent cache eliminates: 25 s
    #     cold (good service weather; r04's 981 s was the same stage on a
    #     bad day) vs 0.3 s on a cache hit (HLO fingerprints verified
    #     stable across processes).
    log("compiling tick...")
    t0 = time.time()
    lowered = jtick.lower(carry)
    lower_s = time.time() - t0
    t0 = time.time()
    lowered.compile()
    backend_compile_s = time.time() - t0
    t0 = time.time()
    carry, out = jtick(carry)
    jax.block_until_ready(out["qpos"])
    first_exec_s = time.time() - t0
    compile_s = lower_s + backend_compile_s + first_exec_s
    log(f"tick compiled in {compile_s:.0f}s (lower {lower_s:.0f}s, "
        f"backend compile {backend_compile_s:.1f}s, first exec "
        f"{first_exec_s:.1f}s)")

    # (a) host-in-the-loop latency at the 50 Hz budget.  Measured tunnel
    # semantics (.scratch/probe_tunnel.py, v5e over axon): dispatch is
    # ~0.01 ms, a blocking fetch pays a ~40 ms RPC round trip, and
    # copy_to_host_async IS asynchronous — a read issued > RTT after the
    # async copy costs ~0.2 ms.  A 50 Hz loop has 20 ms of wall time per
    # tick for copies to land, so the deployment bridge
    # (solvers.mpc.RealtimeController) pipelines ceil(RTT/20ms)+1 ticks
    # deep: tick t dispatches solve(t) + async-copies its ctrl and returns
    # ctrl(t-lag), whose copy has had lag*20 ms > RTT to complete.  The
    # metric is the host-BLOCKING time per tick of a loop paced at 20 ms
    # (that is what "p99 solve latency at 50 Hz" means for a remote
    # device); the unpipelined sync fetch is recorded as the irreducible
    # single-RPC reference.
    from opendog_tpu.solvers.mpc import RealtimeController

    # sync reference first: dispatch + blocking 12-float fetch per tick.
    # This is one irreducible tunnel RPC — it bounds lag below.
    n2 = 50
    lat_sync = np.zeros(n2)
    for i in range(n2):
        t0 = time.perf_counter()
        carry, out = jtick(carry)
        _ = np.asarray(out["ctrl"])
        lat_sync[i] = time.perf_counter() - t0
    sync_p99_ms = float(np.percentile(lat_sync, 99) * 1e3)
    rtt_ms = float(np.median(lat_sync) * 1e3)
    tick_s = 0.02
    lag = int(min(5, max(1, np.ceil(rtt_ms / (tick_s * 1e3)) + 1)))
    log(f"sync RTT {rtt_ms:.1f} ms -> lag {lag}; compiling host-loop "
        "program...")

    rtc = RealtimeController(model, cost, cfg, lag=lag, plant_substeps=10)
    rtc.start(make_state(model, "home"))
    _ = rtc.tick()  # warm the host-loop jit (returns-ctrl-only program)
    log("host-loop program compiled; priming pipeline")
    for _ in range(lag + 3):  # prime: fill the async-copy pipeline at pace
        time.sleep(tick_s)
        _ = rtc.tick()
    log("running paced 50 Hz loop")
    n = 250
    lat = np.zeros(n)
    overruns = 0
    next_t = time.perf_counter()
    for i in range(n):
        next_t += tick_s
        t0 = time.perf_counter()
        ctrl_np = rtc.tick()
        lat[i] = time.perf_counter() - t0
        rest = next_t - time.perf_counter()
        if rest > 0:
            time.sleep(rest)
        else:
            overruns += 1
            next_t = time.perf_counter()
    assert ctrl_np.shape == (model.nu,)
    rtc.drain()
    p99_ms = float(np.percentile(lat, 99) * 1e3)

    log(f"host loop done (p99 {p99_ms:.1f} ms); compiling on-device loop")
    # (b) on-device control loop: the whole 50 Hz MPC loop scanned on-chip
    # (the deployment mode for sim/training) — pure solve throughput
    jrun = jax.jit(lambda c: run(c, 100))
    carry2, traj = jrun(carry)
    jax.block_until_ready(traj["qpos"])
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        carry2, traj = jrun(carry2)
    jax.block_until_ready(traj["qpos"])
    solves_per_sec = 100 * reps / (time.time() - t0)
    # sanity: the controlled robot should still be upright and moving
    qpos = np.asarray(carry2.plant.qpos)
    healthy = bool(0.12 < qpos[2] < 0.5)

    rollouts_per_tick = cfg.num_samples
    result = {
        "metric": "mpc_solves_per_sec_per_chip",
        "value": round(float(solves_per_sec), 2),
        "unit": "solves/s/chip",
        "vs_baseline": round(float(solves_per_sec) / 50.0, 3),
        "host_loop_p99_latency_ms": round(p99_ms, 2),
        "host_loop_median_latency_ms": round(
            float(np.median(lat) * 1e3), 2),
        "host_loop_max_latency_ms": round(float(lat.max() * 1e3), 2),
        "host_loop_mean_latency_ms": round(float(lat.mean() * 1e3), 2),
        "host_loop_meets_50hz_budget": bool(p99_ms < 20.0),
        "host_loop_control_delay_ticks": lag,
        "host_loop_overruns": overruns,
        # unpipelined fetch pays one full tunnel RPC round trip per tick;
        # that single RPC is the irreducible floor the pipeline hides
        "host_loop_sync_p99_ms": round(sync_p99_ms, 2),
        "tunnel_rtt_ms": round(rtt_ms, 2),
        "on_device_solve_ms": round(1e3 / float(solves_per_sec), 3),
        "rollouts_per_tick": rollouts_per_tick,
        "horizon_s": cfg.horizon * cfg.n_substeps * cfg.rollout_dt,
        "compile_s": round(compile_s, 1),
        "lower_s": round(lower_s, 1),
        "backend_compile_s": round(backend_compile_s, 1),
        "first_exec_s": round(first_exec_s, 1),
        "xla_cache_entries_at_start": cache_entries,
        # the cache eliminates the backend-compile stage only; lowering is
        # client-side tracing and is paid per process regardless
        "xla_cache_hit": bool(cache_entries > 0
                              and backend_compile_s < 10.0),
        "plant_healthy": healthy,
        "final_x": round(float(qpos[0]), 3),
        "device": str(jax.devices()[0]),
        "live": True,
    }
    print(json.dumps(result))


def supervise():
    """Run the benchmark in fresh subprocesses with bounded retries.

    Round-2 lesson (VERDICT.md item 1): the axon TPU tunnel can report
    ``RuntimeError: Unable to initialize backend 'axon': UNAVAILABLE`` at the
    first device touch, and JAX caches a failed backend init for the process
    lifetime — so each attempt must be a FRESH process.  The supervisor never
    imports jax itself (only one process may hold the tunnel, CLAUDE.md).

    Degradation ladder:
      1. attempt N times with linear backoff; first attempt whose last stdout
         line parses as the result JSON wins (printed verbatim, rc 0);
      2. all attempts failed -> if a committed validated record exists
         (BENCH_VALIDATED.json, produced by this same script on real TPU),
         emit it with explicit ``live: false`` + ``degraded`` fields so the
         record is honest about its provenance, rc 0;
      3. no validated record -> rc 1 with the last attempt's tail on stderr.
    """
    import threading

    attempts = int(os.environ.get("OPENDOG_BENCH_ATTEMPTS", "5"))
    backoff_s = float(os.environ.get("OPENDOG_BENCH_BACKOFF_S", "60"))
    timeout_s = float(os.environ.get("OPENDOG_BENCH_TIMEOUT_S", "2400"))
    # A down tunnel makes the first jax.devices() HANG rather than raise;
    # without a separate (short) init timeout each attempt would burn the
    # full run timeout (5 x 40 min) before degrading — longer than the
    # driver waits.  420 s covers a slow-but-alive tunnel bring-up.
    init_timeout_s = float(os.environ.get("OPENDOG_BENCH_INIT_TIMEOUT_S",
                                          "420"))

    def log(msg):
        print(f"[bench-supervisor] {msg}", file=sys.stderr, flush=True)

    def run_attempt():
        """Run one child; return (rc, stdout) with rc=None on timeout."""
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        init_seen = threading.Event()

        def drain_stderr():
            for ln in proc.stderr:
                if INIT_SENTINEL in ln:
                    init_seen.set()
                sys.stderr.write(ln)
                sys.stderr.flush()

        t = threading.Thread(target=drain_stderr, daemon=True)
        t.start()
        start = time.time()
        while True:
            rc = proc.poll()
            if rc is not None:
                return rc, proc.stdout.read() or ""
            elapsed = time.time() - start
            if not init_seen.is_set() and elapsed > init_timeout_s:
                proc.kill()
                proc.wait()
                return None, (f"no device init within {init_timeout_s:.0f}s "
                              "(tunnel hang) — attempt killed")
            if elapsed > timeout_s:
                proc.kill()
                proc.wait()
                return None, f"attempt timed out after {timeout_s:.0f}s"
            time.sleep(1.0)

    last_tail = ""
    for i in range(attempts):
        if i:
            sleep_s = backoff_s * i
            log(f"attempt {i} failed; backing off {sleep_s:.0f}s")
            time.sleep(sleep_s)
        log(f"attempt {i + 1}/{attempts} (timeout {timeout_s:.0f}s, "
            f"init timeout {init_timeout_s:.0f}s)")
        rc, out = run_attempt()
        if rc is None:
            last_tail = out
            log(last_tail)
            continue
        out = out.strip()
        line = out.splitlines()[-1] if out else ""
        if rc == 0 and line.startswith("{"):
            try:
                json.loads(line)
            except ValueError:
                last_tail = f"rc 0 but unparseable output: {line[:400]}"
                log(last_tail)
                continue
            print(line, flush=True)
            return 0
        last_tail = f"rc {rc}; stdout tail: {out[-400:]!r}"
        log(last_tail)

    log(f"all {attempts} attempts failed")
    validated = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_VALIDATED.json")
    if os.path.exists(validated):
        with open(validated) as f:
            rec = json.load(f)
        rec["live"] = False
        rec["degraded"] = (
            f"TPU backend unavailable after {attempts} attempts; reporting "
            "the last validated on-chip record (BENCH_VALIDATED.json). "
            f"Last failure: {last_tail[:300]}"
        )
        log("degrading to BENCH_VALIDATED.json record (flagged live=false)")
        print(json.dumps(rec), flush=True)
        return 0
    log("no BENCH_VALIDATED.json to degrade to")
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv[1:]:
        sys.exit(main())
    sys.exit(supervise())

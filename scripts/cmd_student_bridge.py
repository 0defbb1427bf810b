#!/usr/bin/env python
"""Full-stack sim2real rehearsal of the COMMAND student (VERDICT r4
item 4): drive runs/distill_cmd_opendog/student.msgpack through the real
deployment path — SDK → C++ firmware_sim (UDP/JSON + ACK, 500 Hz PID
servo plant) → telemetry-measured angles → DigitalTwin body-state
estimate → next policy tick — with LIVE command switching, the analog of
runs/mpc_bridge but with the distilled student in the policy seat.

Two arms:
  * 50 Hz — the student's training tick rate;
  * 12.5 Hz — the reference robot's achieved on-hardware rate
    (run_robot.py:37), zero-order-holding the gait between commands.

Writes runs/distill_cmd_bridge/metrics.json: per-segment command
tracking (heading-frame speed + wrapped yaw error on the twin), joint
RMSE over the wire, host-loop timing.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FW_DIR = os.path.join(REPO, "opendog_tpu", "native", "firmware_sim")
FW_BIN = os.path.join(FW_DIR, "firmware_sim")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/distill_cmd_bridge")
    ap.add_argument("--student", default="runs/distill_cmd_opendog")
    ap.add_argument("--listen_port", type=int, default=19845)
    ap.add_argument("--seg_ticks", type=int, default=150)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # host loop: no tunnel RPCs

    from opendog_tpu.apps.mpc_bridge import StudentBridge
    from opendog_tpu.rl.distill_zoo import cmd_distill_setup, load_student
    from opendog_tpu.sdk import QuadPilotBody

    if not os.path.exists(FW_BIN):
        subprocess.run(["make", "-C", FW_DIR], check=True)
    p1, p2 = args.listen_port + 1, args.listen_port + 2
    procs = [subprocess.Popen(
        [FW_BIN, "--port", str(p), "--telemetry-port",
         str(args.listen_port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for p in (p1, p2)]
    try:
        setup = cmd_distill_setup("opendog", engine="xla")
        policy = load_student(os.path.join(args.student, "student.msgpack"),
                              setup, command_dim=3)
        body = QuadPilotBody(ip1="127.0.0.1", ip2="127.0.0.1",
                             port1=p1, port2=p2,
                             listen_for_broadcasts=True,
                             listen_port=args.listen_port)
        bridge = StudentBridge(setup.model, policy, body)
        assert bridge.bring_up(settle_s=1.0), "bring-up not ACKed"
        deadline = time.time() + 3.0
        while time.time() < deadline:
            if (body.is_data_available_from_esp(0)
                    and body.is_data_available_from_esp(1)):
                break
            time.sleep(0.05)
        else:
            raise RuntimeError("no telemetry from firmware sims")

        T = 10 if args.smoke else args.seg_ticks
        # live command schedule: stand -> slow trot -> nominal trot ->
        # trot+turn left -> trot+turn right -> turn in place -> stand
        schedule = [
            ([0.0, 0.0, 0.0], T),
            ([0.1, 0.0, 0.0], 2 * T),
            ([0.17, 0.0, 0.0], 2 * T),
            ([0.15, 0.0, 0.3], 2 * T),
            ([0.15, 0.0, -0.3], 2 * T),
            ([0.0, 0.0, 0.2], 2 * T),
            ([0.0, 0.0, 0.0], T),
        ]
        # warm the policy jit OUTSIDE the paced/timed window (first tick
        # compiles; 8.7 s measured — it must not count as loop latency)
        for _ in range(10):
            bridge.tick()
            time.sleep(0.02)

        res = {"student": args.student,
               "recipe_fingerprint": setup.recipe["cost_params"]
               ["amp_knots"]}
        for rate in ((50.0,) if args.smoke else (50.0, 12.5)):
            out = bridge.run_segments(schedule, rate_hz=rate)
            key = f"rate_{rate:g}hz"
            res[key] = out
            print(key, json.dumps(
                {k: v for k, v in out.items() if k != "segments"}),
                flush=True)
            for s in out["segments"]:
                print("  ", json.dumps(s), flush=True)
            # settle back to stand between arms
            bridge.set_command([0.0, 0.0, 0.0])
            for _ in range(20):
                bridge.tick()
                time.sleep(0.02)

        seg50 = res["rate_50hz"]["segments"]
        moving = [s for s in seg50 if s["cmd"][0] > 0]
        res["summary"] = dict(
            upright_all=bool(all(s["z_min"] > 0.035 for s in seg50)),
            stand_holds=bool(abs(seg50[0]["mean_vx_cmd_frame"]) < 0.03),
            walks_on_command=bool(all(s["mean_vx_cmd_frame"] > 0.03
                                      for s in moving)),
            turns_on_command=bool(all(
                s["yaw_err"] < 0.25 for s in seg50 if s["cmd"][2] != 0.0)),
        )
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "metrics.json"), "w") as f:
            json.dump(res, f, indent=2)
        print(json.dumps(res["summary"]), flush=True)
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.wait(timeout=5)


if __name__ == "__main__":
    main()

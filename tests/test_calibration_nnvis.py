import os

import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.apps.calibration import (
    PIDGains,
    analyze_response,
    firmware_power,
    simulate_pid_response,
)
from opendog_tpu.apps.nnvis import (
    activation_summary,
    capture_activations,
    render_activation_dashboard,
)
from opendog_tpu.rl import MLPActorCritic


def test_firmware_power_law_parity():
    """Exact parity checks of computePower (esp32_motors.ino:131-144)."""
    g = PIDGains()
    # inside dead zone -> zero P/D, only integral
    assert firmware_power(g, 5, 0, 0.0, 0.002) == 0.0
    # large error saturates the scaled P term at max power
    p = firmware_power(g, 1000, 0, 0.0, 0.002)
    assert p == g.p * g.max_power  # 229.5 (d term zero)
    # boosted-D region triples the derivative term (small delta so the
    # +-max_power/2 clip doesn't mask the boost)
    p_in = firmware_power(g, 40, -0.05, 0.0, 0.002)  # |err| <= 50 -> boost
    p_out = firmware_power(g, 60, -0.05, 0.0, 0.002)
    assert p_in < p_out


def test_pid_simulation_converges():
    out = simulate_pid_response(target_deg=45.0, duration_s=2.0,
                                noise_std=0.5)
    m = analyze_response(out["time"], out["angle_deg"], 45.0)
    assert m["settled"], m
    assert m["rise_time_s"] < 1.0
    assert m["steady_state_error_deg"] < 3.0


def test_bad_gains_detected():
    """A wildly overdamped gain set should fail the settling criterion in
    the analysis — the tuning workflow the reference used pid.py for."""
    out = simulate_pid_response(
        gains=PIDGains(p=0.02, i=0.0, d=0.0), target_deg=45.0,
        duration_s=1.0,
    )
    m = analyze_response(out["time"], out["angle_deg"], 45.0)
    assert m["rise_time_s"] > 0.1 or not m["settled"]


def test_activation_capture_and_dashboard(tmp_path):
    net = MLPActorCritic(action_dim=4, hidden=(16, 8))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 10)))
    acts = capture_activations(net, params, jnp.ones((1, 10)))
    assert len(acts) >= 3  # dense layers + outputs
    summ = activation_summary(acts)
    for v in summ.values():
        assert np.isfinite(v["mean"])
    seq = [
        capture_activations(net, params,
                            jnp.ones((1, 10)) * (0.1 * t))
        for t in range(5)
    ]
    p = str(tmp_path / "acts.png")
    render_activation_dashboard(seq, p)
    assert os.path.getsize(p) > 1000

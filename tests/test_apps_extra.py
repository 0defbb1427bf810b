import json
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp

from opendog_tpu.apps.cloning import (
    cloned_lift_angles,
    expert_action,
    train_cloned_policy,
)
from opendog_tpu.apps.dashboard import (
    render_terminal_dashboard,
    serve_web_dashboard,
    snapshot_from_body,
)
from opendog_tpu.apps.obstacle import (
    AvoidState,
    ObstacleAvoider,
    detect_obstacles,
)
from opendog_tpu.apps.voice import (
    GaitMode,
    RobotCommand,
    VoiceGaitMachine,
    parse_command,
)


def test_expert_action_matches_p_controller():
    out = np.asarray(expert_action(jnp.array(0.0)))
    np.testing.assert_allclose(out, [30.0, 30.0])
    out = np.asarray(expert_action(jnp.array(10.0)))  # c = 15
    np.testing.assert_allclose(out, [20.0, 45.0])


def test_cloning_learns_expert():
    net, params = train_cloned_policy(jax.random.PRNGKey(0), num_steps=1500)
    for e in (-20.0, -5.0, 0.0, 5.0, 20.0):
        n, y = cloned_lift_angles(net, params, e)
        want = np.asarray(expert_action(jnp.array(e)))
        assert abs(n - want[0]) < 2.5 and abs(y - want[1]) < 2.5


def test_obstacle_detection_finds_cluster():
    rng = np.random.default_rng(0)
    cluster = rng.normal([1.0, 0.1, 0.2], 0.02, size=(200, 3))
    noise = rng.uniform([-2, -2, -0.05], [2, 2, 0.0], size=(50, 3))
    pts = jnp.asarray(np.concatenate([cluster, noise]))
    centers, counts = jax.jit(detect_obstacles)(pts)
    c = np.asarray(centers)
    found = c[np.isfinite(c).all(axis=1)]
    assert len(found) >= 1
    d = np.linalg.norm(found - [1.0, 0.1], axis=1)
    assert d.min() < 0.1


def test_avoider_state_machine():
    av = ObstacleAvoider()
    av.start(target_yaw=0.0)
    # clear path: walking straight
    yaw = av.update(np.zeros((0, 2)), 0.0)
    assert av.state == AvoidState.WALKING and yaw == 0.0
    # obstacle dead ahead slightly left -> steer right (negative yaw kept?)
    yaw = av.update(np.array([[0.5, 0.1]]), 0.0)
    assert av.state == AvoidState.AVOIDING
    assert yaw == -35.0
    # cleared -> back to base heading
    yaw = av.update(np.zeros((0, 2)), yaw)
    assert av.state == AvoidState.WALKING and yaw == 0.0


def test_voice_commands_reference_vocabulary():
    assert parse_command("perrito camina") == RobotCommand.WALK
    assert parse_command("PERRITO, a la derecha!") == RobotCommand.RIGHT
    assert parse_command("perrito párate") == RobotCommand.STAND
    assert parse_command("camina") is None  # no activation word
    assert parse_command("perrito hola") is None
    m = VoiceGaitMachine()
    assert m.apply(RobotCommand.WALK) == GaitMode.WALKING
    assert m.apply(RobotCommand.LEFT) == GaitMode.TURNING_LEFT
    assert m.target_yaw_delta() == 30.0
    assert m.apply(RobotCommand.SHUTDOWN) == GaitMode.SHUTDOWN


class _FakeBody:
    def get_latest_motor_data_for_esp(self, i):
        return {"angles": [1.0, 2, 3, 4], "targetPos": [10, 20, 30, 40],
                "encoderPos": [9, 19, 29, 39],
                "esp_control_fully_enabled": True}

    def get_latest_dmp_data_for_esp(self, i):
        return {"ypr_deg": {"yaw": 5.0, "pitch": 0.0, "roll": -2.0}}


def test_dashboards():
    snap = snapshot_from_body(_FakeBody())
    text = render_terminal_dashboard(snap)
    assert "ESP0" in text and "yaw=   5.00" in text
    server, thread = serve_web_dashboard(lambda: snap)
    port = server.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/data") as r:
        data = json.loads(r.read())
    assert data["esp0"]["targetPos"] == [10, 20, 30, 40]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
        assert b"OpenDOG" in r.read()
    server.shutdown()


def test_gait_designer_and_replay():
    from opendog_tpu.assets import load_opendog
    from opendog_tpu.sim2real.gait_designer import TrotParams, design_trot

    m = load_opendog("flat")
    durations, sim_ctrl, real_deg = design_trot(m)
    assert len(durations) == 14  # hold + 12 + return (main.py:77,151)
    assert durations[0] == 1.0 and durations[1] == 0.4
    assert sim_ctrl.shape == (14, 8)
    # step 1 swings FR/BL: FR knee flexes by front_knee_lift (clamped)
    from opendog_tpu.sim2real.calibration import ACTUATOR_NAMES_ORDERED
    i_frk = ACTUATOR_NAMES_ORDERED.index("FR_knee_actuator")
    i_flk = ACTUATOR_NAMES_ORDERED.index("FL_knee_actuator")
    home_frk = sim_ctrl[0, i_frk]
    assert sim_ctrl[1, i_frk] < home_frk  # flexed (lift)
    assert sim_ctrl[1, i_flk] > home_frk  # extended (stance)
    # alternation
    assert sim_ctrl[2, i_flk] < sim_ctrl[1, i_flk]


def test_depth_stream_and_normalize():
    """Monocular depth loop (2d.py) with a synthetic predictor."""
    import numpy as np
    from opendog_tpu.apps import depth as depth_mod

    frames = [np.zeros((4, 6, 3), np.uint8), np.ones((4, 6, 3), np.uint8)]
    predictor = lambda f: f[..., 0].astype(np.float32) + np.arange(6)[None]
    outs = list(depth_mod.depth_stream(frames, predictor))
    assert len(outs) == 2
    d, u8 = outs[0]
    assert d.shape == (4, 6) and u8.dtype == np.uint8
    assert u8.min() == 0 and u8.max() == 255
    # constant depth map normalises to zeros, not NaN
    flat = depth_mod.normalize_depth(np.full((3, 3), 7.0))
    assert (flat == 0).all()


def test_obstacle_avoidance_frame_renders():
    """The headless scene view of the avoidance loop (the reference's
    pyray display half): obstacle pillars red, corridor rails white,
    robot green — all present in the rendered frame."""
    import numpy as np
    import jax

    from opendog_tpu.apps.obstacle import (
        ObstacleAvoider, detect_obstacles, render_avoidance_frame,
    )

    rng = np.random.default_rng(1)
    floor = np.stack([rng.uniform(0, 2, 3000), rng.uniform(-1, 1, 3000),
                      rng.normal(0, 0.01, 3000)], 1)
    box = np.stack([rng.uniform(0.55, 0.7, 400),
                    rng.uniform(-0.08, 0.08, 400),
                    rng.uniform(0.05, 0.3, 400)], 1)
    pts = np.concatenate([floor, box]).astype(np.float32)
    centers, counts = jax.jit(detect_obstacles)(pts)
    av = ObstacleAvoider()
    av.start(0.0)
    av.update(np.asarray(centers), 0.0)
    img = render_avoidance_frame(pts, np.asarray(centers), av)
    assert img.shape == (360, 480, 3)
    red = (img[..., 0].astype(int) - img[..., 2].astype(int) > 120).sum()
    green = (img[..., 1].astype(int) - img[..., 0].astype(int) > 120).sum()
    assert red > 5, f"no obstacle pillars rendered ({red})"
    assert green > 2, f"no robot marker rendered ({green})"
    assert (img.min(-1) > 200).any(), "no corridor rails"

"""Live force scope (test/RealTimePlotter.py + client.py plots) and the
3-D IMU vector visualizer (examples/imu_visualizer.py)."""
import numpy as np

from opendog_tpu.telemetry import ForceScope, simulation_packet, watch
from opendog_tpu.apps import imu_viz


def _packet(forces):
    return simulation_packet(
        0.1, np.zeros(15), np.zeros(14), np.zeros(8),
        np.asarray(forces, dtype=float), ncon=4)


def test_force_scope_roll_semantics():
    """RealTimePlotter.update_plot:30-34 — roll left, append at the end."""
    scope = ForceScope(buffer_size=5)
    for i in range(7):
        scope.update([i, 10 + i, 20 + i, 30 + i])
    # last 5 samples survive, oldest first
    np.testing.assert_allclose(scope.data[0], [2, 3, 4, 5, 6])
    np.testing.assert_allclose(scope.data[3], [32, 33, 34, 35, 36])
    assert scope.n_samples == 7


def test_force_scope_watches_packet_stream(tmp_path):
    """client.py:67-100 semantics: the scope consumes the wire schema's
    contact_forces z-components in FL,FR,BL,BR order; both renderers
    produce output."""
    pkts = [_packet([[0, 0, 4.0 + i], [0, 0, 5.0], [0, 0, 5.0], [0, 0, 5.2]])
            for i in range(10)]
    frames = []
    scope = watch(iter(pkts), scope=ForceScope(buffer_size=8),
                  on_frame=lambda s: frames.append(s.data[0, -1]),
                  max_packets=10)
    assert len(frames) == 10
    assert scope.data[0, -1] == 13.0  # 4.0 + 9
    assert scope.data[3, -1] == 5.2
    txt = scope.render_terminal(width=8)
    assert "Front Left" in txt and "N" in txt
    out = scope.render_png(str(tmp_path / "scope.png"))
    assert (tmp_path / "scope.png").stat().st_size > 1000
    assert out.endswith("scope.png")


def test_imu_projection_geometry():
    """project_vector is the elev=20/azim=45 orthographic view: a vector
    along +z projects mostly 'up', x and y are symmetric under the 45 deg
    azimuth, and normalization matches the reference quiver."""
    up = imu_viz.project_vector([0, 0, 1])
    assert abs(up[0]) < 1e-9 and up[1] > 0.9
    px = imu_viz.project_vector([1, 0, 0])
    py = imu_viz.project_vector([0, 1, 0])
    # azim 45: x and y differ only by screen-u sign
    np.testing.assert_allclose(px[1], py[1], atol=1e-9)
    np.testing.assert_allclose(px[0], -py[0], atol=1e-9)
    v = imu_viz.normalize([3, 4, 0])
    np.testing.assert_allclose(np.linalg.norm(v), 1.0)
    np.testing.assert_allclose(imu_viz.normalize([0, 0, 0]), [0, 0, 0])


def test_imu_visualizer_loop_and_renderers(tmp_path):
    """The 100 ms polling loop of imu_visualizer.py:49-74 against a fake
    IMU source, including the missing-field default of :57-61."""
    samples = iter([
        {"accel_x": 0.0, "accel_y": 0.0, "accel_z": 9.81},
        {"accel_x": 2.0, "accel_y": -1.0},          # accel_z defaults to 0
        None,                                        # dropped poll -> zeros
    ])
    seen = []
    last = imu_viz.run(lambda: next(samples), n_frames=3, period_s=0.0,
                       on_frame=lambda v: seen.append(v.copy()))
    assert len(seen) == 3
    np.testing.assert_allclose(seen[0], [0, 0, 9.81])
    np.testing.assert_allclose(seen[1], [2.0, -1.0, 0.0])
    np.testing.assert_allclose(last, [0, 0, 0])

    frame = imu_viz.render_terminal([0, 0, 9.81])
    assert "accel" in frame and "*" in frame
    imu_viz.render_png([1.0, 2.0, 3.0], str(tmp_path / "imu.png"))
    assert (tmp_path / "imu.png").stat().st_size > 1000

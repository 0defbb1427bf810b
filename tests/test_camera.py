"""SDK camera client <-> C++ camera-firmware simulator (loopback HTTP)."""
import os
import subprocess
import time
import urllib.request

import pytest

CAM_DIR = os.path.join(
    os.path.dirname(__file__), "..", "opendog_tpu", "native", "camera_sim"
)
BIN = os.path.join(CAM_DIR, "camera_sim")
from conftest import build_native, worker_port_offset

_worker_offset = worker_port_offset


PORT = 18181 + _worker_offset()


@pytest.fixture(scope="module")
def camera_proc():
    if not build_native(CAM_DIR, BIN):
        pytest.skip("no make")
    p = subprocess.Popen([BIN, "--port", str(PORT)],
                         stdout=subprocess.DEVNULL)
    time.sleep(0.3)
    yield p
    p.terminate()
    p.wait(timeout=5)


@pytest.fixture()
def cam(camera_proc):
    from opendog_tpu.sdk import QuadPilotCamera

    return QuadPilotCamera("127.0.0.1", port=PORT, timeout=3.0)


def test_imu_and_ads_endpoints(cam):
    imu = cam.get_imu_data()
    assert imu and "accel" in imu and abs(imu["accel"]["z"] - 9.81) < 0.01
    ads = cam.get_ads_data()
    assert ads and set(ads) == {"ch0", "ch1", "ch2", "ch3"}


def test_framesize_control(cam):
    assert cam.change_framesize("QVGA")
    import json

    with urllib.request.urlopen(
        f"http://127.0.0.1:{PORT}/status", timeout=3
    ) as r:
        assert json.loads(r.read())["framesize"] == 4


def test_mjpeg_stream_yields_frames(cam):
    frames = []
    for f in cam.stream():
        frames.append(f)
        if len(frames) >= 3:
            cam.stop_stream()
            break
    assert len(frames) >= 3
    raw = frames[0] if isinstance(frames[0], bytes) else None
    if raw is not None:
        assert raw[:2] == b"\xff\xd8" and raw[-2:] == b"\xff\xd9"
    else:  # cv2 decoded
        assert frames[0] is not None


def test_sse_events_stream(camera_proc):
    import requests

    r = requests.get(f"http://127.0.0.1:{PORT}/events", stream=True,
                     timeout=5)
    lines = []
    for line in r.iter_lines():
        if line.startswith(b"data:"):
            lines.append(line)
            if len(lines) >= 2:
                break
    r.close()
    import json

    payload = json.loads(lines[0][5:])
    assert "imu" in payload and "ads" in payload


def test_camera_viewer_headless(cam, tmp_path):
    """apps/camera_viewer (Code/main.py parity): background stream thread,
    framesize dropdown handler, FPS/status tracking, frame sink."""
    from opendog_tpu.apps.camera_viewer import FRAMESIZES, CameraViewer

    got = []
    v = CameraViewer(cam, sink=lambda jpg, i: got.append((i, len(jpg))),
                     save_dir=str(tmp_path), save_every=2)
    assert "VGA" in FRAMESIZES
    assert v.change_framesize("QVGA")
    v.start()
    t0 = time.time()
    while len(got) < 5 and time.time() - t0 < 10:
        time.sleep(0.05)
    v.stop()
    assert len(got) >= 5
    assert all(n > 100 for _, n in got)  # real JPEG payloads
    assert got[0][1] and got[0][0] == 0
    saved = list(tmp_path.glob("frame_*.jpg"))
    assert saved  # every 2nd frame written
    assert v.frames >= 5 and v.status in ("stopped",)

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lsd_tpu.runtime.camera_source import CameraSource, CameraUnit
from lsd_tpu.runtime.config import ConfigManager
from lsd_tpu.runtime import clear_interfaces


@pytest.fixture(autouse=True)
def _clean():
    clear_interfaces()
    yield
    clear_interfaces()


def make_video(path, n=10, w=64, h=48):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h))
    rng = np.random.default_rng(0)
    for k in range(n):
        frame = np.full((h, w, 3), k * 20 % 255, np.uint8)
        frame[:10, :10] = rng.integers(0, 255, (10, 10, 3), dtype=np.uint8)
        vw.write(frame)
    vw.release()
    return path


class TestCameraSource:
    def test_video_file_capture(self, tmp_path):
        vid = make_video(str(tmp_path / "v.avi"))
        cfg = ConfigManager().config
        cfg.camera = [dict(name="front", source=vid)]
        cfg.input.camera_hz = 50.0
        src = CameraSource(cfg)
        src.setup(cfg)
        try:
            assert len(src.units) == 1
            frame = src.get_data()
            assert frame is not None and frame["image_valid"]
            jpg = frame["image"]["front"]
            img = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
            assert img.shape == (48, 64, 3)
            assert "front" in frame["image_param"]
        finally:
            src.release()

    def test_missing_camera_degrades(self):
        cfg = ConfigManager().config
        cfg.camera = [dict(name="bad", source="/nonexistent/video.avi")]
        src = CameraSource(cfg)
        src.setup(cfg)
        assert len(src.units) == 0
        assert src.get_data() is None
        src.release()

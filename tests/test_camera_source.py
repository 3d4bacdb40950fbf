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


class TestUndistortion:
    """N22 parity (VERDICT r3 #10): the reference's OpenCV-remap
    GStreamer element (hardware/gstreamer/gstopencvremap.cpp) as a
    per-frame cv2.remap in the capture path, keyed by the camera
    config's 'undistortion' flag (camera_data_manager.py:84)."""

    def _unit(self, tmp_path, undist, intr):
        vid = make_video(str(tmp_path / "v.avi"), w=64, h=48)
        return CameraUnit("front", vid, intrinsic=intr,
                          cam_cfg=dict(undistortion=undist))

    def test_maps_match_cv2_undistort(self, tmp_path):
        intr = [60.0, 60.0, 32.0, 24.0, -0.25, 0.05, 0.0, 0.0]
        u = self._unit(tmp_path, True, intr)
        try:
            rng = np.random.default_rng(1)
            img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            m = u._undistort_maps((48, 64))
            assert m is not None
            out = cv2.remap(img, m[0], m[1], cv2.INTER_LINEAR)
            K = np.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
            ref = cv2.undistort(img, K, np.asarray(intr[4:8] + [0.0]))
            # integer remap maps vs exact undistort: near-identical
            assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 3.0
        finally:
            u.close()

    def test_grab_applies_undistortion(self, tmp_path):
        intr = [60.0, 60.0, 32.0, 24.0, -0.3, 0.0, 0.0, 0.0]
        u_on = self._unit(tmp_path, True, intr)
        u_off = self._unit(tmp_path, False, intr)
        try:
            a = cv2.imdecode(np.frombuffer(u_on.grab(), np.uint8), 1)
            b = cv2.imdecode(np.frombuffer(u_off.grab(), np.uint8), 1)
            assert a.shape == b.shape
            # strong barrel distortion must visibly move pixels
            assert np.mean(np.abs(a.astype(int) - b.astype(int))) > 1.0
            assert u_on._maps and u_on._maps is not False
        finally:
            u_on.close()
            u_off.close()

    def test_no_intrinsics_disables_gracefully(self, tmp_path):
        u = self._unit(tmp_path, True, None)
        try:
            jpg = u.grab()
            assert jpg is not None          # falls through un-undistorted
            assert u._maps is False
        finally:
            u.close()

import socket
import time

import numpy as np
import pytest

pytest.importorskip("lsd_tpu.native")

from lsd_tpu.runtime import ConfigManager, ModuleManager, clear_interfaces
from lsd_tpu.runtime.lidar_source import LidarSource
from lsd_tpu.runtime.modules import SinkModule
from tests.test_native import make_custom_packet, make_vlp16_packet


@pytest.fixture(autouse=True)
def _clean():
    clear_interfaces()
    yield
    clear_interfaces()


class TestLiveLidarSource:
    def test_udp_to_pipeline_frames(self):
        cfg = ConfigManager().config
        cfg.input.scan_hz = 10.0
        cfg.lidar = [dict(name="0-Custom", port=28881, decoder="Custom",
                          range_min=0.1, range_max=100.0)]
        cfg.pipeline = [["Source", "Sink"]]
        mm = ModuleManager({"Source": LidarSource, "Sink": SinkModule})
        mm.build(cfg.pipeline, cfg)
        mm.start()
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        pts = np.asarray([[3.0, 1.0, 0.2, 0.9], [5.0, -2.0, 0.5, 0.4]], np.float32)
        bank = mm.modules["Sink"].data_bank
        deadline = time.time() + 8.0
        got = None
        while time.time() < deadline:
            tx.sendto(make_custom_packet(pts), ("127.0.0.1", 28881))
            got = bank.get_latest()
            if got is not None:
                break
            time.sleep(0.02)
        mm.stop()
        assert got is not None, "no frame produced from live UDP"
        assert got["lidar_valid"]
        cloud = got["points"]["0-Custom"]
        assert len(cloud) >= 2
        np.testing.assert_allclose(sorted(cloud[:2, 0].tolist())[:2],
                                   [3.0, 5.0], atol=0.5)

    def test_two_lidars_merge(self):
        cfg = ConfigManager().config
        cfg.input.scan_hz = 10.0
        cfg.lidar = [dict(name="0-Custom", port=28882, decoder="Custom"),
                     dict(name="1-VLP-16", port=28883, decoder="VLP-16")]
        src = LidarSource(cfg)
        src.setup(cfg)
        try:
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            pts = np.asarray([[4.0, 0.0, 0.0, 1.0]], np.float32)
            deadline = time.time() + 5.0
            frame = None
            while time.time() < deadline:
                tx.sendto(make_custom_packet(pts), ("127.0.0.1", 28882))
                tx.sendto(make_vlp16_packet(dist_m=8.0), ("127.0.0.1", 28883))
                frame = src.get_data()
                if frame and len(frame.get("points", {})) == 2:
                    break
            assert frame is not None
            assert set(frame["points"].keys()) == {"0-Custom", "1-VLP-16"}
            assert len(frame["points"]["1-VLP-16"]) > 100
        finally:
            src.release()

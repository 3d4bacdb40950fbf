import socket
import time

import numpy as np
import pytest

from lsd_tpu.io.gpchc import format_gpchc
from lsd_tpu.runtime import ConfigManager, clear_interfaces
from lsd_tpu.runtime.aux_sources import InsSource, RadarSource
from lsd_tpu.runtime.interface import call_interface
from lsd_tpu.sensors.radar import RadarObject, encode_ars408_object


@pytest.fixture(autouse=True)
def _clean():
    clear_interfaces()
    yield
    clear_interfaces()


class TestRadarSource:
    def test_can_frames_to_radar_frame(self):
        cfg = ConfigManager().config
        frames = []
        o = RadarObject(id=3, x=20.0, y=-1.5, vx=8.0, vy=0.0, type=1,
                        length=4.2, width=1.8)
        script = [(0x60A, b"\x01")] + encode_ars408_object(o) + [(0x60A, b"\x01")]

        def reader():
            return [script.pop(0)] if script else []

        src = RadarSource(cfg, can_reader=reader)
        out = None
        for _ in range(6):
            out = src.get_data()
            if out:
                break
        assert out is not None and out["radar_valid"]
        objs = out["radar"]["ARS408"]
        assert len(objs) == 1
        np.testing.assert_allclose(objs[0]["x"], 20.0, atol=0.2)
        assert call_interface("radar.get_status")["objects"] in (0, 1)


class TestInsSource:
    def test_gpchc_udp_ingest_and_trigger(self):
        cfg = ConfigManager().config
        src = InsSource(cfg, port=28899)
        src.setup(cfg)
        try:
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            base = 1700000000 * 1000000
            for k in range(5):
                fix = dict(timestamp=base + k * 100000,
                           latitude=42.0 + k * 6.0e-6, longitude=-83.0,
                           altitude=200.0, heading=0.0, pitch=0.0, roll=0.0,
                           gyro_x=0.0, gyro_y=0.0, gyro_z=0.01,
                           acc_x=0.0, acc_y=0.0, acc_z=1.0,
                           Ve=0.0, Vn=6.6, Vu=0.0, Status=4)
                tx.sendto(format_gpchc(fix).encode(), ("127.0.0.1", 28899))
                time.sleep(0.02)
            deadline = time.time() + 2
            while time.time() < deadline and src.last_fix is None:
                time.sleep(0.02)
            assert src.last_fix is not None
            out = call_interface("ins.trigger", base + 150000)
            assert out["ins_valid"] and out["pose"] is not None
            out2 = call_interface("ins.trigger", base + 350000)
            assert out2["motion_valid"]
            # ~6.6 m/s north over 0.2 s -> ~1.3 m motion
            d = np.linalg.norm(out2["motion"][:3, 3])
            np.testing.assert_allclose(d, 1.33, atol=0.4)
            status = call_interface("ins.get_status")
            assert status["valid"]
        finally:
            src.release()

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


class TestBinaryIns:
    def test_bddb0b_roundtrip(self):
        from lsd_tpu.io.ins_binary import format_bddb0b, parse_bddb0b
        src = dict(heading=91.5, pitch=1.25, roll=-0.5,
                   gyro_x=1.0, gyro_y=-2.0, gyro_z=0.25,
                   acc_x=0.01, acc_y=-0.02, acc_z=1.0,
                   latitude=31.123456, longitude=121.654321, altitude=15.2,
                   Ve=1.5, Vn=-0.75, Vu=0.1, Status=42)
        raw = format_bddb0b(src)
        fix, rest, ptype = parse_bddb0b(b"junk" + raw + b"tail")
        assert fix is not None
        assert ptype == 42 and fix["Status"] == 42
        assert abs(fix["heading"] - src["heading"]) < 0.02
        assert abs(fix["latitude"] - src["latitude"]) < 1e-6
        assert abs(fix["longitude"] - src["longitude"]) < 1e-6
        assert abs(fix["altitude"] - src["altitude"]) < 0.01
        assert abs(fix["gyro_y"] - src["gyro_y"]) < 0.02
        assert abs(fix["acc_z"] - src["acc_z"]) < 0.001
        assert abs(fix["Ve"] - src["Ve"]) < 0.01

    def test_bddb0b_bad_checksum(self):
        from lsd_tpu.io.ins_binary import format_bddb0b, parse_bddb0b
        raw = bytearray(format_bddb0b(dict(heading=10.0)))
        raw[20] ^= 0xFF  # corrupt
        fix, rest, _ = parse_bddb0b(bytes(raw))
        assert fix is None

    def test_livox_imu(self):
        import struct
        from lsd_tpu.io.ins_binary import parse_livox_imu
        pkt = bytearray(60)
        pkt[10] = 0  # data_type: IMU
        struct.pack_into("<6f", pkt, 36, 0.1, -0.2, 0.3, 0.0, 0.0, 1.0)
        fix = parse_livox_imu(bytes(pkt))
        assert fix is not None and fix["imu_only"]
        assert abs(fix["gyro_x"] - np.rad2deg(0.1)) < 1e-4
        assert abs(fix["acc_z"] - 1.0) < 1e-6
        assert parse_livox_imu(bytes(pkt[:59])) is None

    def test_ins_source_binary_stream(self):
        from lsd_tpu.runtime.config import AttrDict as EasyDict
        from lsd_tpu.io.ins_binary import format_bddb0b
        from lsd_tpu.runtime.aux_sources import InsSource
        src = InsSource(EasyDict(dict(ins={})))
        raw = format_bddb0b(dict(heading=45.0, latitude=31.0, longitude=121.0,
                                 altitude=10.0, Status=4))
        # stream split across chunks exercises reassembly
        src.feed_bytes(raw[:20])
        assert src.last_fix is None
        src.feed_bytes(raw[20:])
        assert src.last_fix is not None
        assert abs(src.last_fix["heading"] - 45.0) < 0.02


class TestSerialPort:
    def test_pty_roundtrip(self):
        import os, pty
        from lsd_tpu.sensors.serial_port import SerialPort
        master, slave = pty.openpty()
        try:
            port = SerialPort(os.ttyname(slave), baud=115200, timeout_s=0.5)
            port.open()
            os.write(master, b"$GPCHC,test\r\n")
            got = b""
            for _ in range(10):
                got += port.read()
                if b"\n" in got:
                    break
            assert b"$GPCHC,test" in got
            port.write(b"ack")
            assert os.read(master, 16) == b"ack"
            port.close()
        finally:
            os.close(master)
            os.close(slave)

    def test_ins_source_serial(self):
        import os, pty, time
        from lsd_tpu.runtime.config import AttrDict as EasyDict
        from lsd_tpu.runtime.aux_sources import InsSource
        from lsd_tpu.io.gpchc import format_gpchc
        master, slave = pty.openpty()
        try:
            src = InsSource(EasyDict(dict(ins=dict(device=os.ttyname(slave),
                                                   baud=115200))))
            src.setup(None)
            line = format_gpchc(dict(heading=10.0, pitch=0.0, roll=0.0,
                                     gyro_x=0, gyro_y=0, gyro_z=0,
                                     acc_x=0, acc_y=0, acc_z=1,
                                     latitude=31.0, longitude=121.0,
                                     altitude=5.0, Ve=0, Vn=0, Vu=0,
                                     baseline=0, NSV1=10, NSV2=10, Status=42,
                                     age=0, Warnning=0,
                                     timestamp=int(time.time() * 1e6)))
            # resend until the rx thread has opened its side of the pty
            for _ in range(50):
                os.write(master, (line + "\r\n").encode())
                if src.last_fix is not None:
                    break
                time.sleep(0.1)
            src.release()
            assert src.last_fix is not None
            assert abs(src.last_fix["latitude"] - 31.0) < 1e-6
        finally:
            os.close(master)
            os.close(slave)


class TestSourceManager:
    """Multi-sensor merge façade (runtime/source_manager.py; ref
    module/source/source_manager.py get_data:66-91)."""

    def test_offline_delegates_to_player(self, tmp_path):
        from lsd_tpu.io.recorder import FrameRecorder
        from lsd_tpu.runtime import clear_interfaces
        from lsd_tpu.runtime.config import ConfigManager
        from lsd_tpu.runtime.interface import has_interface
        from lsd_tpu.runtime.source_manager import SourceManager
        from tests.test_io import make_frame_dict
        clear_interfaces()
        rec = FrameRecorder(str(tmp_path / "rec"))
        for k in range(3):
            rec.write(make_frame_dict(ts=1_000_000 + k * 100_000))
        cfg = ConfigManager().config
        cfg["input"]["data_path"] = rec.log_dir
        src = SourceManager(cfg)
        src.setup(cfg)
        assert has_interface("player.get_status")
        d = src.get_data()
        assert d is not None and d["lidar_valid"]
        src.release()
        clear_interfaces()

    def test_online_merges_radar_and_ins(self):
        from lsd_tpu.io.gpchc import format_gpchc
        from lsd_tpu.runtime import clear_interfaces
        from lsd_tpu.runtime.config import ConfigManager
        from lsd_tpu.runtime.source_manager import SourceManager
        clear_interfaces()
        cfg = ConfigManager().config
        cfg["input"]["mode"] = "online"
        cfg["input"]["scan_hz"] = 50.0
        cfg["lidar"] = []
        cfg["camera"] = []
        cfg["radar"] = [dict(use=True)]
        cfg["ins"]["use"] = True
        cfg["ins"]["port"] = 0          # no socket; feed directly
        src = SourceManager(cfg)
        src.setup(cfg)
        assert src.radar is not None and src.ins is not None
        # feed an ARS408 object + a GPCHC fix directly
        from lsd_tpu.sensors.radar import RadarObject
        src.radar.latest = (123, [RadarObject(id=1, x=10.0, y=1.0, vx=3.0)])
        sent = ("$GPCHC,2260,303867.00,10.0,0.1,-0.1,0.01,0.02,0.03,0.001,"
                "0.002,0.998,42.0,-83.0,270.0,1.0,2.0,0.0,2.24,18,22,42,1,2*55")
        src.ins.feed_sentence(sent)
        assert src.ins.last_fix is not None
        d = src.get_data()
        assert d is not None
        assert d["radar_valid"] and d["radar"]["ARS408"][0]["x"] == 10.0
        assert d["ins_valid"] and d["ins_data"]["latitude"] == 42.0
        assert d["_source"] == "Source"
        src.release()
        clear_interfaces()

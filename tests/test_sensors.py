import numpy as np
import pytest

from lsd_tpu.sensors import (Ars408Parser, InsMotionTracker, RadarObject,
                             decode_can_obstacle_a, encode_can_frames)
from lsd_tpu.sensors.radar import encode_ars408_object
from lsd_tpu.sensors.can_sink import (encode_obstacle_a, encode_obstacle_b,
                                      encode_status)


class TestRadar:
    def test_roundtrip_single_object(self):
        p = Ars408Parser()
        o = RadarObject(id=7, x=25.4, y=-3.2, vx=10.5, vy=-0.75,
                        ax=0.5, ay=-0.1, yaw_deg=12.0, length=4.4, width=1.8, type=1)
        assert p.feed(0x60A, b"\x01") is None  # header, empty frame
        for can_id, data in encode_ars408_object(o):
            assert p.feed(can_id, data) is None
        stamp, objs = p.feed(0x60A, b"\x01")   # next header flushes
        assert len(objs) == 1
        g = objs[0]
        assert g.id == 7 and g.type == 1
        np.testing.assert_allclose([g.x, g.y], [25.4, -3.2], atol=0.2)
        np.testing.assert_allclose([g.vx, g.vy], [10.5, -0.75], atol=0.25)
        np.testing.assert_allclose(g.length, 4.4, atol=0.2)
        np.testing.assert_allclose(g.yaw_deg, 12.0, atol=0.4)

    def test_extrinsic_applied(self):
        T = np.eye(4)
        T[:3, 3] = (1.0, 0.0, 0.5)
        p = Ars408Parser(extrinsic=T)
        o = RadarObject(id=1, x=10.0, y=0.0)
        p.feed(0x60A, b"\x00")
        for cid, d in encode_ars408_object(o):
            p.feed(cid, d)
        _, objs = p.feed(0x60A, b"\x00")
        np.testing.assert_allclose(objs[0].x, 11.0, atol=0.2)
        np.testing.assert_allclose(objs[0].z, 0.5, atol=1e-6)


class TestCanSink:
    def test_obstacle_a_roundtrip(self):
        frame = encode_obstacle_a(42, 12.5, -3.25, 1.0, -7.5, 2, 3, True)
        out = decode_can_obstacle_a(frame)
        assert out["id"] == 42 and out["type"] == 2 and out["valid"]
        np.testing.assert_allclose(out["x"], 12.5, atol=0.0625)
        np.testing.assert_allclose(out["y"], -3.25, atol=0.0625)
        np.testing.assert_allclose(out["vx"], -7.5, atol=0.0625)

    def test_full_frame_set(self):
        objs = [dict(id=1, box=np.asarray([5, 2, 0, 4, 2, 1.6, 0.2]),
                     velocity=np.asarray([3.0, 0, 0]), score=0.8, age=5,
                     valid=True, label=0)]
        frames = encode_can_frames(dict(objects=objs, timestamp=1000000))
        assert frames[0][0] == 0x500
        assert len(frames) == 1 + 3
        assert all(len(f[1]) == 8 for f in frames)


class TestIns:
    def test_interpolation_and_motion(self):
        trk = InsMotionTracker()
        # straight east drive at 5 m/s, fixes every 100 ms
        for k in range(11):
            trk.feed_fix(dict(timestamp=k * 100000, latitude=42.0,
                              longitude=-83.0 + k * 6.05e-6,  # ~0.5 m east
                              altitude=100.0, heading=90.0, pitch=0, roll=0))
            trk.feed_imu(k * 100000, [0, 0, 0], [0, 0, 1.0])
        out1 = trk.trigger(250000)   # mid-interval
        assert out1["pose"] is not None
        out2 = trk.trigger(750000)
        assert out2["motion_valid"]
        # moved ~2.5 m in 0.5 s; heading 90 (east) -> body x forward
        d = np.linalg.norm(out2["motion"][:3, 3])
        np.testing.assert_allclose(d, 2.5, atol=0.3)
        assert len(out2["imu"]) >= 4

    def test_no_fixes(self):
        trk = InsMotionTracker()
        out = trk.trigger(1000)
        assert out["pose"] is None and not out["motion_valid"]


def test_radar_objects_serialize_to_proto():
    from lsd_tpu.proto.detection import parse_detection, serialize_detection
    result = dict(timestamp=123, objects=[], radar={
        "ARS408": [dict(id=4, x=12.5, y=-3.0, vx=5.0, vy=0.1,
                        yaw_deg=90.0, length=4.2, width=1.8, type=1)]})
    data = serialize_detection(result)
    msg = parse_detection(data)
    radar = msg["radar"][0]
    assert radar["radar_name"] == "ARS408"
    obj = radar["radar_object"][0]
    assert obj["id"] == 4 and obj["type"] == 1
    assert abs(obj["box"]["center"]["x"] - 12.5) < 1e-6
    assert abs(obj["velocity_x"] - 5.0) < 1e-6
    assert abs(obj["box"]["heading"] - 1.5708) < 1e-3


class TestCanBus:
    def test_frame_pack_unpack(self):
        from lsd_tpu.sensors.can_bus import (CAN_FRAME_SIZE, pack_frame,
                                             unpack_frame)
        raw = pack_frame(0x60B, b"\x01\x02\x03\x04\x05")
        assert len(raw) == CAN_FRAME_SIZE == 16
        cid, data = unpack_frame(raw)
        assert cid == 0x60B and data == b"\x01\x02\x03\x04\x05"
        # full 8-byte payload
        cid, data = unpack_frame(pack_frame(0x123, bytes(range(8))))
        assert data == bytes(range(8))

    def test_socket_roundtrip_if_vcan(self):
        """Real AF_CAN loopback when a vcan interface exists (skipped in
        plain containers)."""
        import pytest
        from lsd_tpu.sensors.can_bus import can_available, open_can_reader
        if not can_available():
            pytest.skip("AF_CAN unsupported")
        rx = open_can_reader("vcan0")
        if rx is None:
            pytest.skip("no vcan0 interface")
        tx = open_can_reader("vcan0")
        tx.send(0x60B, b"\xaa\xbb")
        import time
        time.sleep(0.05)
        frames = rx.read()
        assert (0x60B, b"\xaa\xbb") in frames
        rx.close()
        tx.close()


class TestInsStatusMachine:
    """Priority/stable-time INS quality gating (ref slam.cpp
    preprocessInsData:194-268)."""

    def make(self):
        from lsd_tpu.sensors.ins_status import InsStatusMachine
        return InsStatusMachine()

    def test_upgrade_requires_stable_time(self):
        sm = self.make()
        # single fix (prio 0) accepted only after 10 s of stability
        assert sm.update(0.0, 1) == -1      # starts the clock
        assert sm.update(5.0, 1) == -1
        assert sm.update(10.5, 1) == 0      # stable long enough
        # upgrade to rtk_fix needs 1 s at the new status
        assert sm.update(11.0, 42) == 0     # still the old priority
        assert sm.update(12.1, 42) == 2

    def test_downgrade_is_immediate(self):
        sm = self.make()
        sm.update(0.0, 42)
        sm.update(2.0, 42)
        assert sm.update(3.5, 42) == 2
        assert sm.update(4.0, 52) == 1      # fix -> float: instant
        assert sm.state_name == "rtk_float"

    def test_lost_fix_invalidates_after_1s(self):
        sm = self.make()
        sm.update(0.0, 42)
        assert sm.update(1.5, 42) == 2
        assert sm.update(1.6, 0, latitude=0.0, longitude=0.0) == -1
        assert sm.last_priority == 2        # < 1 s: state retained
        assert sm.update(3.0, 0, latitude=0.0, longitude=0.0) == -1
        assert sm.last_priority == -1       # >= 1 s: invalidated

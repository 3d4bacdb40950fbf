import time

import numpy as np
import pytest

from lsd_tpu.comms import MessageBus, MessageServer
from lsd_tpu.comms.messages import (decode_typed, encode_typed, imu_msg,
                                    odometry_msg, pointcloud_msg, sniff_type)


class TestMessages:
    def test_odometry_roundtrip(self):
        T = np.eye(4)
        T[:3, 3] = (1.0, 2.0, 3.0)
        data = odometry_msg(123, T, vel=[5.0, 0, 0])
        name, msg = decode_typed(data)
        assert name == "Odometry"
        assert msg["header"]["stamp_us"] == 123
        np.testing.assert_allclose(msg["pose"]["position"]["y"], 2.0)
        np.testing.assert_allclose(msg["twist"]["linear"]["x"], 5.0)

    def test_sniff(self):
        assert sniff_type(imu_msg(1, [0.1, 0, 0], [0, 0, 9.8])) == "Imu"
        assert sniff_type(b"") is None
        assert sniff_type(b"\xff garbage") is None

    def test_pointcloud(self):
        pts = np.random.default_rng(0).normal(size=(100, 4)).astype(np.float32)
        name, msg = decode_typed(pointcloud_msg(5, pts))
        assert name == "PointCloud" and msg["num_points"] == 100
        back = np.frombuffer(msg["data"], np.float32).reshape(-1, 4)
        np.testing.assert_allclose(back, pts)


class TestBus:
    def test_pub_sub_roundtrip(self):
        bus = MessageBus(bus="t1")
        got = []
        sub = bus.subscribe(lambda ch, p: got.append((ch, p)))
        time.sleep(0.1)
        for k in range(5):
            bus.publish("slam.odometry", odometry_msg(k, np.eye(4)))
            time.sleep(0.01)
        deadline = time.time() + 2
        while time.time() < deadline and len(got) < 5:
            time.sleep(0.02)
        sub.close()
        assert len(got) >= 3, f"only {len(got)} messages delivered"
        assert got[0][0] == "slam.odometry"

    def test_disable(self):
        bus = MessageBus(bus="t2")
        got = []
        sub = bus.subscribe(lambda ch, p: got.append(ch))
        time.sleep(0.1)
        bus.set_enabled(False)
        bus.publish("x", b"\x00")
        time.sleep(0.2)
        sub.close()
        assert not got


class TestMessageServer:
    def test_collect_and_query(self):
        bus = MessageBus(bus="t3")
        srv = MessageServer(bus)
        time.sleep(0.1)
        T = np.eye(4)
        for k in range(8):
            T[0, 3] = float(k)
            bus.publish("slam.odometry", odometry_msg(k * 1000, T, vel=[k * 1.0, 0, 0]))
            time.sleep(0.01)
        deadline = time.time() + 2
        while time.time() < deadline and "slam.odometry" not in srv.get_meta():
            time.sleep(0.02)
        meta = srv.get_meta()
        assert meta.get("slam.odometry") == "Odometry"
        latest = srv.get_latest("slam.odometry")
        assert latest["type"] == "Odometry"
        series = srv.get_series("slam.odometry", "twist.linear.x")
        assert len(series) >= 3
        assert series == sorted(series)
        srv.close()

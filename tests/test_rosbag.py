"""rosbag v2.0 container + converter tests (pure-Python, no ROS).

The reference converts datasets with ROS-linked C++ tools
(tools/rosbag_to_pkl, tools/pkl_to_rosbag); these tests verify our
dependency-free equivalents via write->read roundtrips.
"""
import os

import numpy as np
import pytest

from lsd_tpu.tools.rosbag import (BagReader, BagWriter, parse_imu,
                                  parse_navsatfix, parse_pointcloud2,
                                  pkl_to_rosbag, rosbag_to_pkl,
                                  serialize_imu, serialize_navsatfix,
                                  serialize_pointcloud2)


class TestMessageCodecs:
    def test_pointcloud2_roundtrip(self):
        pts = np.random.default_rng(0).normal(size=(100, 4)).astype(np.float32)
        pts[:, 3] = np.abs(pts[:, 3]) % 1.0
        raw = serialize_pointcloud2(123_456_789_000, pts)
        stamp, out, t = parse_pointcloud2(raw)
        assert stamp == 123_456_789_000
        np.testing.assert_allclose(out, pts, rtol=1e-6)
        assert t is None

    def test_imu_roundtrip(self):
        raw = serialize_imu(42_000_000_000, (0.1, -0.2, 0.3), (0.0, 0.1, 9.8))
        m = parse_imu(raw)
        assert m["stamp_ns"] == 42_000_000_000
        np.testing.assert_allclose(m["gyro"], (0.1, -0.2, 0.3))
        np.testing.assert_allclose(m["accel"], (0.0, 0.1, 9.8))

    def test_navsatfix_roundtrip(self):
        raw = serialize_navsatfix(7_000_000_000, 31.5, 121.25, 12.5, status=2)
        m = parse_navsatfix(raw)
        assert m["stamp_ns"] == 7_000_000_000
        assert abs(m["latitude"] - 31.5) < 1e-12
        assert abs(m["longitude"] - 121.25) < 1e-12
        assert m["status"] == 2


class TestBagContainer:
    def test_write_read_roundtrip(self, tmp_path):
        bag = str(tmp_path / "t.bag")
        pts = np.ones((10, 4), np.float32)
        with BagWriter(bag) as w:
            w.write("/velodyne_points", "sensor_msgs/PointCloud2",
                    1_000_000_000, serialize_pointcloud2(1_000_000_000, pts))
            w.write("/imu_raw", "sensor_msgs/Imu", 1_100_000_000,
                    serialize_imu(1_100_000_000, (0, 0, 0.1), (0, 0, 9.81)))
            w.write("/gps", "sensor_msgs/NavSatFix", 1_200_000_000,
                    serialize_navsatfix(1_200_000_000, 31.0, 121.0, 5.0))
        msgs = list(BagReader(bag).read())
        assert [m[0] for m in msgs] == ["/velodyne_points", "/imu_raw", "/gps"]
        assert [m[1] for m in msgs] == ["sensor_msgs/PointCloud2",
                                        "sensor_msgs/Imu",
                                        "sensor_msgs/NavSatFix"]
        assert msgs[0][2] == 1_000_000_000
        _, out, _ = parse_pointcloud2(msgs[0][3])
        np.testing.assert_allclose(out, pts)

    def test_topic_filter(self, tmp_path):
        bag = str(tmp_path / "t.bag")
        with BagWriter(bag) as w:
            for k in range(3):
                w.write("/a", "sensor_msgs/Imu", k,
                        serialize_imu(k, (0, 0, 0), (0, 0, 9.81)))
                w.write("/b", "sensor_msgs/Imu", k,
                        serialize_imu(k, (0, 0, 0), (0, 0, 9.81)))
        msgs = list(BagReader(bag).read(["/b"]))
        assert len(msgs) == 3 and all(m[0] == "/b" for m in msgs)

    def test_rejects_non_bag(self, tmp_path):
        p = tmp_path / "x.bag"
        p.write_bytes(b"not a bag")
        with pytest.raises(ValueError):
            BagReader(str(p))


class TestConverters:
    def _make_bag(self, path, n_scans=3):
        rng = np.random.default_rng(1)
        with BagWriter(path) as w:
            t0 = 10_000_000_000
            for k in range(n_scans):
                t = t0 + k * 100_000_000
                for j in range(10):   # 100 Hz IMU
                    it = t - 100_000_000 + j * 10_000_000
                    w.write("/imu_raw", "sensor_msgs/Imu", it,
                            serialize_imu(it, (0, 0, 0.05), (0, 0, 9.81)))
                w.write("/gps", "sensor_msgs/NavSatFix", t,
                        serialize_navsatfix(t, 31.0 + k * 1e-5, 121.0, 4.0,
                                            status=2))
                pts = rng.normal(size=(200, 4)).astype(np.float32) * 5
                w.write("/velodyne_points", "sensor_msgs/PointCloud2", t,
                        serialize_pointcloud2(t, pts))
        return path

    def test_rosbag_to_pkl(self, tmp_path):
        # this bag is END-stamped: each cloud's IMU precedes its stamp
        bag = self._make_bag(str(tmp_path / "in.bag"))
        out = rosbag_to_pkl(bag, str(tmp_path / "rec"), stamp_at="end")
        from lsd_tpu.io.player import FramePlayer
        frames = list(FramePlayer(out).iter_dicts())
        assert len(frames) == 3
        f = frames[-1]
        assert f["lidar_valid"] and f["ins_valid"]
        (name, pts), = f["points"].items()
        assert pts.shape == (200, 4)
        assert f["imu_data"].shape[1] == 7
        assert f["imu_data"].shape[0] >= 9
        assert abs(f["ins_data"]["latitude"] - 31.00002) < 1e-6
        # imu accel converted m/s^2 -> g
        np.testing.assert_allclose(f["imu_data"][:, 6], 1.0, atol=0.01)

    def test_pkl_to_rosbag_cycle(self, tmp_path):
        bag = self._make_bag(str(tmp_path / "in.bag"))
        rec = rosbag_to_pkl(bag, str(tmp_path / "rec"))
        bag2 = str(tmp_path / "out.bag")
        n = pkl_to_rosbag(rec, bag2)
        assert n > 3
        clouds = [m for m in BagReader(bag2).read(["/velodyne_points"])]
        assert len(clouds) == 3
        _, pts, _ = parse_pointcloud2(clouds[0][3])
        assert pts.shape == (200, 4)


class TestStartStampedConverter:
    """Start-stamped bags (FAST-LIO/velodyne convention) with per-point
    time fields: the scan-start-relative IMU window the runtime expects."""

    def _make_start_bag(self, path, n_scans=3):
        rng = np.random.default_rng(2)
        with BagWriter(path) as w:
            t0 = 10_000_000_000
            for k in range(n_scans):
                t = t0 + k * 100_000_000
                pts = rng.normal(size=(150, 4)).astype(np.float32) * 5
                trel = np.linspace(0, 0.099, 150).astype(np.float32)
                w.write("/velodyne_points", "sensor_msgs/PointCloud2", t,
                        serialize_pointcloud2(t, pts, t_rel=trel))
                for j in range(10):    # IMU covering [t, t+0.1)
                    it = t + j * 10_000_000
                    w.write("/imu_raw", "sensor_msgs/Imu", it,
                            serialize_imu(it, (0, 0, 0.05), (0, 0, 9.81)))
        return path

    def test_scan_start_window_and_point_times(self, tmp_path):
        bag = self._make_start_bag(str(tmp_path / "s.bag"))
        out = rosbag_to_pkl(bag, str(tmp_path / "rec"))
        from lsd_tpu.io.player import FramePlayer
        frames = list(FramePlayer(out).iter_dicts())
        assert len(frames) == 3           # EOF flushes the held frame
        for f in frames:
            imu = f["imu_data"]
            assert imu.shape[0] == 10
            # rel stamps measured from SCAN START, inside [0, period)
            assert imu[:, 0].min() >= 0.0 and imu[:, 0].max() < 0.1
            np.testing.assert_allclose(np.diff(imu[:, 0]), 0.01, atol=1e-6)
            # per-point times survive into points_attr[:, 0]
            (name, attr), = f["points_attr"].items()
            t = attr["points_attr"][:, 0]
            assert t.min() == 0.0 and abs(t.max() - 0.099) < 1e-5

    def test_pointcloud2_time_field_roundtrip(self):
        pts = np.zeros((8, 4), np.float32)
        trel = np.arange(8, dtype=np.float32) * 0.01
        raw = serialize_pointcloud2(5_000_000_000, pts, t_rel=trel)
        stamp, out, t = parse_pointcloud2(raw)
        assert stamp == 5_000_000_000
        np.testing.assert_allclose(t, trel, atol=1e-7)
        assert out.shape == (8, 4)

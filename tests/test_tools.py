import os

import numpy as np
import pytest

from lsd_tpu.io.player import FramePlayer
from lsd_tpu.tools import convert_kitti_odometry, convert_kitti_raw_oxts


def make_kitti_odometry(root, n=4):
    seq = root / "00"
    (seq / "velodyne").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for k in range(n):
        pts = rng.normal(size=(500, 4)).astype(np.float32)
        pts.tofile(str(seq / "velodyne" / ("%06d.bin" % k)))
    np.savetxt(str(seq / "times.txt"), np.arange(n) * 0.1)
    return str(seq)


def make_kitti_raw(root, n=3):
    drive = root / "drive"
    (drive / "velodyne_points" / "data").mkdir(parents=True)
    (drive / "oxts" / "data").mkdir(parents=True)
    rng = np.random.default_rng(1)
    for k in range(n):
        pts = rng.normal(size=(300, 4)).astype(np.float32)
        pts.tofile(str(drive / "velodyne_points" / "data" / ("%010d.bin" % k)))
        row = np.zeros(30)
        row[0], row[1], row[2] = 49.0 + k * 1e-5, 8.43, 112.0
        row[5] = 0.5   # yaw
        row[11:14] = (0.1, 0.0, 9.81)
        row[17:20] = (0.0, 0.0, 0.05)
        row[23] = 4
        np.savetxt(str(drive / "oxts" / "data" / ("%010d.txt" % k)), row[None])
    return str(drive)


class TestKittiConverters:
    def test_odometry_conversion_replays(self, tmp_path):
        seq = make_kitti_odometry(tmp_path)
        log = convert_kitti_odometry(seq, str(tmp_path / "out"))
        assert os.path.exists(os.path.join(log, "cfg.yaml"))
        player = FramePlayer(log, point_capacity=1024)
        frames = list(player)
        assert len(frames) == 4
        assert frames[0].scan.num_valid == 500
        assert frames[1].timestamp_monotonic > frames[0].timestamp_monotonic

    def test_raw_oxts_conversion(self, tmp_path):
        drive = make_kitti_raw(tmp_path)
        log = convert_kitti_raw_oxts(drive, str(tmp_path / "out2"))
        player = FramePlayer(log, point_capacity=1024)
        frames = list(player)
        assert len(frames) == 3
        f = frames[0]
        assert f.ins is not None and f.ins.valid
        np.testing.assert_allclose(f.ins.latitude, 49.0, atol=1e-9)
        assert f.imu is not None and f.imu.mask.sum() == 1
        # yaw 0.5 rad ENU -> heading deg NED
        np.testing.assert_allclose(f.ins.heading, (90 - np.rad2deg(0.5)) % 360,
                                   atol=1e-6)


class TestNcltConverter:
    def _write_nclt(self, root, n_packets=12, hits_per=50):
        import struct
        rng = np.random.default_rng(3)
        path = str(root / "velodyne_hits.bin")
        with open(path, "wb") as f:
            for k in range(n_packets):
                utime = 1000000 + k * 25000   # 4 packets per 100ms frame
                f.write(struct.pack("<IIQI", 0xAD9CAD9C, hits_per, utime, 0))
                xyz = ((rng.uniform(-50, 50, (hits_per, 3)) + 100.0) / 0.005)
                for row in xyz.astype(np.uint16):
                    f.write(struct.pack("<HHHBB", row[0], row[1], row[2], 128, 0))
        # ms25: utime, mag3, accel3, gyro3
        imu = np.zeros((30, 10))
        imu[:, 0] = 1000000 + np.arange(30) * 10000
        imu[:, 6] = 9.81
        imu[:, 9] = 0.05
        np.savetxt(str(root / "ms25.csv"), imu, delimiter=",")
        gps = np.zeros((4, 8))
        gps[:, 0] = 1000000 + np.arange(4) * 100000
        gps[:, 1] = 3
        gps[:, 3] = np.deg2rad(42.29)
        gps[:, 4] = np.deg2rad(-83.71)
        gps[:, 5] = 270.0
        np.savetxt(str(root / "gps.csv"), gps, delimiter=",")
        return path

    def test_convert_and_replay(self, tmp_path):
        from lsd_tpu.tools.nclt import convert_nclt
        vel = self._write_nclt(tmp_path)
        log = convert_nclt(vel, str(tmp_path / "out"),
                           ms25_csv=str(tmp_path / "ms25.csv"),
                           gps_csv=str(tmp_path / "gps.csv"))
        player = FramePlayer(log, point_capacity=1024)
        frames = list(player)
        assert len(frames) >= 2
        f = frames[0]
        assert f.scan.num_valid == 200  # 4 packets x 50 hits
        pts = f.scan.points[f.scan.mask.astype(bool)]
        assert np.all(np.abs(pts[:, :3]) < 51.0)
        assert f.imu is not None and f.imu.mask.sum() >= 5
        # accel converted to g units, gyro z present
        row = f.imu.data[0]
        np.testing.assert_allclose(row[6], 1.0, atol=0.01)   # az = 9.81 -> 1 g
        np.testing.assert_allclose(row[3], 0.05, atol=1e-6)  # gyro z
        assert f.ins is not None and f.ins.valid
        np.testing.assert_allclose(f.ins.latitude, 42.29, atol=1e-6)


class TestRecvTool:
    def test_recv_detection(self):
        import socket
        import threading
        from lsd_tpu.proto.detection import serialize_detection
        from lsd_tpu.tools.recv import recv_detection
        port = 28981
        out = {}
        th = threading.Thread(
            target=lambda: out.update(n=recv_detection(port, max_frames=2)))
        th.start()
        import time
        time.sleep(0.3)
        payload = serialize_detection(dict(
            timestamp=123, objects=[dict(id=1, label=0, score=0.9,
                                         box=[1, 2, 0, 4, 2, 1.5, 0.0])]))
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for _ in range(2):
            tx.sendto(payload, ("127.0.0.1", port))
            time.sleep(0.05)
        th.join(3.0)
        assert out.get("n") == 2

    def test_recv_localization(self):
        import socket
        import threading
        import time
        from lsd_tpu.io.gpchc import format_gpchc
        from lsd_tpu.tools.recv import recv_localization
        port = 28982
        out = {}
        th = threading.Thread(
            target=lambda: out.update(n=recv_localization(port, max_frames=1)))
        th.start()
        time.sleep(0.3)
        line = format_gpchc(dict(heading=1.0, pitch=0, roll=0, gyro_x=0,
                                 gyro_y=0, gyro_z=0, acc_x=0, acc_y=0,
                                 acc_z=1, latitude=31.0, longitude=121.0,
                                 altitude=4.0, Ve=0, Vn=0, Vu=0, baseline=0,
                                 NSV1=9, NSV2=9, Status=4, age=0, Warnning=0,
                                 timestamp=int(time.time() * 1e6)))
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto((line + "\r\n").encode(), ("127.0.0.1", port))
        th.join(3.0)
        assert out.get("n") == 1

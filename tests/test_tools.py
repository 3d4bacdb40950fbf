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

import os
import pickle

import numpy as np
import pytest

from lsd_tpu.io import (FramePlayer, FrameRecorder, normalize_frame_dict,
                        read_pcd, write_pcd, parse_gpchc, format_gpchc)
from lsd_tpu.io.frame import frame_from_dict, pad_points, pad_imu


def make_frame_dict(ts=1000000, n=100):
    rng = np.random.default_rng(0)
    return dict(
        frame_start_timestamp=ts,
        frame_timestamp_monotonic=ts,
        points={"0-Ouster-OS1": rng.normal(size=(n, 4)).astype(np.float32)},
        points_attr={"0-Ouster-OS1": dict(timestamp=ts, points_attr=np.zeros((n, 2), np.float32))},
        image={}, image_param={},
        lidar_valid=True, image_valid=False, radar_valid=False, ins_valid=True,
        ins_data=dict(timestamp=ts, latitude=42.0, longitude=-83.0, altitude=270.0,
                      heading=10.0, pitch=0.1, roll=-0.1, Ve=1.0, Vn=2.0, Vu=0.0,
                      Status=0, gyro_x=0.0, gyro_y=0.0, gyro_z=0.01,
                      acc_x=0.0, acc_y=0.0, acc_z=1.0),
        imu_data=np.asarray([[ts, 0, 0, 0.01, 0, 0, 1.0]], dtype=np.float64),
        motion_t=np.eye(4, dtype=np.float32), motion_valid=True,
        timestep=100000,
    )


class TestFrameSchema:
    def test_pad_points_bucketing(self):
        pts, stamps, mask = pad_points(np.ones((100, 4), np.float32))
        assert pts.shape[0] in (2 ** 14,)
        assert mask.sum() == 100
        assert np.all(pts[100:] == 0)

    def test_pad_points_truncation(self):
        pts, _, mask = pad_points(np.ones((300, 4), np.float32), capacity=256)
        assert pts.shape == (256, 4) and mask.sum() == 256

    def test_pad_imu(self):
        batch = pad_imu(np.ones((3, 7)))
        assert batch.data.shape == (64, 7) and batch.mask.sum() == 3

    def test_frame_from_dict(self):
        f = frame_from_dict(make_frame_dict(), point_capacity=512)
        assert f.scan.points.shape == (512, 4)
        assert f.scan.num_valid == 100
        assert f.ins.latitude == 42.0
        assert f.imu.mask.sum() == 1
        assert f.motion_valid


class TestPlayerRecorder:
    def test_record_replay_roundtrip(self, tmp_path):
        rec = FrameRecorder(str(tmp_path), cfg_yaml="pipeline: []")
        d = make_frame_dict()
        rec.write(d)
        rec.write(make_frame_dict(ts=1100000))
        logdir = rec.log_dir
        assert os.path.exists(os.path.join(logdir, "cfg.yaml"))
        player = FramePlayer(logdir, point_capacity=512)
        frames = list(player)
        assert len(frames) == 2
        assert frames[0].timestamp_monotonic == 1000000

    def test_legacy_normalization(self, tmp_path):
        # legacy dict: no points_attr, no imu_data, no motion_valid
        d = make_frame_dict()
        del d["points_attr"], d["imu_data"], d["motion_valid"], d["frame_timestamp_monotonic"]
        d["points"] = {"0Ouster-OS1": d["points"].pop("0-Ouster-OS1")}
        nd = normalize_frame_dict(pickle.loads(pickle.dumps(d)))
        assert "0-Ouster-OS1" in nd["points"]
        assert nd["motion_valid"] is True
        assert nd["imu_data"].shape == (1, 7)
        assert nd["frame_timestamp_monotonic"] == d["frame_start_timestamp"]


class TestPCD:
    def test_roundtrip_binary(self, tmp_path):
        pts = np.random.default_rng(1).normal(size=(50, 4)).astype(np.float32)
        path = str(tmp_path / "c.pcd")
        write_pcd(path, pts)
        out = read_pcd(path)
        np.testing.assert_allclose(out, pts, rtol=1e-6)

    def test_roundtrip_ascii(self, tmp_path):
        pts = np.random.default_rng(2).normal(size=(10, 4)).astype(np.float32)
        path = str(tmp_path / "c.pcd")
        write_pcd(path, pts, binary=False)
        out = read_pcd(path)
        np.testing.assert_allclose(out, pts, atol=1e-5)


class TestGPCHC:
    def test_roundtrip(self):
        ins = dict(timestamp=1700000000 * 1000000, heading=123.45, pitch=1.5, roll=-0.5,
                   gyro_x=0.01, gyro_y=-0.02, gyro_z=0.3,
                   acc_x=0.1, acc_y=0.0, acc_z=1.0,
                   latitude=42.2931950, longitude=-83.7096570, altitude=270.5,
                   Ve=1.0, Vn=-2.0, Vu=0.1, Status=4)
        s = format_gpchc(ins)
        assert s.startswith("$GPCHC,")
        out = parse_gpchc(s)
        assert out is not None
        assert abs(out["timestamp"] - ins["timestamp"]) < 2000  # us rounding
        for k in ("heading", "pitch", "roll", "latitude", "longitude", "Status"):
            np.testing.assert_allclose(out[k], ins[k], atol=1e-6)

    def test_reject_garbage(self):
        assert parse_gpchc("$GPGGA,foo") is None
        assert parse_gpchc("$GPCHC,1,2") is None

import numpy as np
import jax.numpy as jnp
import pytest

from lsd_tpu.calibration import (align_trajectories, calibrate_camera_intrinsics,
                                 hand_eye_calibration, heading_calibration,
                                 homography_dlt, lidar_ground_calibration,
                                 ransac_ground_plane, solve_pnp)
from lsd_tpu.geometry import so3


class TestGround:
    def test_ransac_finds_tilted_ground(self):
        rng = np.random.default_rng(0)
        # ground tilted 5 deg about x, sensor 1.8m above, plus wall clutter
        R = np.asarray(so3.exp_so3(jnp.asarray([0.087, 0.0, 0.0])))
        ground = np.stack([rng.uniform(-20, 20, 3000), rng.uniform(-20, 20, 3000),
                           np.full(3000, -1.8)], axis=1) @ R.T
        wall = np.stack([rng.uniform(5, 5.2, 500), rng.uniform(-5, 5, 500),
                         rng.uniform(-1.8, 3, 500)], axis=1)
        pts = np.concatenate([ground + rng.normal(0, 0.01, ground.shape), wall])
        n, d, inl = ransac_ground_plane(pts)
        gt_n = R @ np.asarray([0, 0, 1.0])
        assert abs(np.dot(n, gt_n)) > 0.999
        assert inl.sum() > 2500

    def test_ground_calibration_levels(self):
        rng = np.random.default_rng(1)
        R = np.asarray(so3.exp_so3(jnp.asarray([0.05, -0.03, 0.0])))
        ground = np.stack([rng.uniform(-20, 20, 2000), rng.uniform(-20, 20, 2000),
                           np.full(2000, -1.5)], axis=1) @ R.T
        T, info = lidar_ground_calibration(ground)
        lev = ground @ T[:3, :3].T + T[:3, 3]
        assert np.std(lev[:, 2]) < 0.01  # leveled plane
        assert abs(info["roll"] - (-0.05)) < 0.01 or abs(info["roll"]) < 0.06

    def test_heading(self):
        traj = np.stack([np.linspace(0, 10, 50), np.linspace(0, 10, 50)], axis=1)
        yaw = heading_calibration(traj)
        np.testing.assert_allclose(yaw, np.pi / 4, atol=1e-6)


class TestTrajectoryAlign:
    def test_umeyama_recovers_transform(self):
        rng = np.random.default_rng(2)
        src = rng.normal(size=(100, 3)) * 5
        R = np.asarray(so3.exp_so3(jnp.asarray([0.2, -0.1, 0.7])))
        t = np.asarray([3.0, -2.0, 0.5])
        dst = src @ R.T + t + rng.normal(0, 0.01, src.shape)
        T, s = align_trajectories(src, dst)
        np.testing.assert_allclose(T[:3, :3], R, atol=1e-2)
        np.testing.assert_allclose(T[:3, 3], t, atol=0.02)

    def test_hand_eye(self):
        rng = np.random.default_rng(3)
        X = np.eye(4)
        X[:3, :3] = np.asarray(so3.exp_so3(jnp.asarray([0.0, 0.0, 0.5])))
        X[:3, 3] = (0.8, 0.1, -0.3)
        # body trajectory with varied rotations
        poses_a = [np.eye(4)]
        for k in range(30):
            d = np.eye(4)
            d[:3, :3] = np.asarray(so3.exp_so3(jnp.asarray(rng.normal(0, 0.2, 3))))
            d[:3, 3] = rng.normal(0, 0.5, 3)
            poses_a.append(poses_a[-1] @ d)
        Xi = np.linalg.inv(X)
        poses_b = [Xi @ T @ X for T in poses_a]
        X_est = hand_eye_calibration(poses_a, poses_b)
        np.testing.assert_allclose(X_est[:3, :3], X[:3, :3], atol=1e-3)
        np.testing.assert_allclose(X_est[:3, 3], X[:3, 3], atol=1e-2)


class TestCamera:
    def _project(self, K, T, pts3):
        p = (K @ (T[:3, :3] @ pts3.T + T[:3, 3:4])).T
        return p[:, :2] / p[:, 2:3]

    def test_pnp(self):
        rng = np.random.default_rng(4)
        K = np.asarray([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
        T = np.eye(4)
        T[:3, :3] = np.asarray(so3.exp_so3(jnp.asarray([0.1, -0.2, 0.05])))
        T[:3, 3] = (0.2, -0.1, 0.3)
        pts3 = rng.uniform(-3, 3, (40, 3)) + np.asarray([0, 0, 8.0])
        pts2 = self._project(K, T, pts3)
        T_est, rms = solve_pnp(pts3, pts2, K)
        np.testing.assert_allclose(T_est[:3, :3], T[:3, :3], atol=1e-3)
        np.testing.assert_allclose(T_est[:3, 3], T[:3, 3], atol=1e-2)
        assert rms < 1.0

    def test_homography(self):
        rng = np.random.default_rng(5)
        H_gt = np.asarray([[1.1, 0.05, 20], [-0.03, 0.95, -8], [1e-4, -5e-5, 1.0]])
        src = rng.uniform(0, 640, (30, 2))
        hom = np.concatenate([src, np.ones((30, 1))], axis=1) @ H_gt.T
        dst = hom[:, :2] / hom[:, 2:3]
        H = homography_dlt(src, dst)
        np.testing.assert_allclose(H, H_gt / H_gt[2, 2], atol=1e-4)

    def test_intrinsics_zhang(self):
        # synthetic chessboard views
        rng = np.random.default_rng(6)
        K = np.asarray([[500.0, 0, 320], [0, 480, 240], [0, 0, 1]])
        board = np.stack(np.meshgrid(np.arange(7), np.arange(5), indexing="ij"),
                         axis=-1).reshape(-1, 2) * 0.05
        obj = np.concatenate([board, np.zeros((35, 1))], axis=1)
        objs, imgs = [], []
        for k in range(6):
            T = np.eye(4)
            T[:3, :3] = np.asarray(so3.exp_so3(jnp.asarray(
                [0.3 * np.sin(k), 0.3 * np.cos(k), 0.1 * k])))
            T[:3, 3] = (0.05 * k, -0.03 * k, 1.0 + 0.1 * k)
            p = (K @ (T[:3, :3] @ obj.T + T[:3, 3:4])).T
            imgs.append(p[:, :2] / p[:, 2:3])
            objs.append(obj)
        Ke, dist, rms = calibrate_camera_intrinsics(objs, imgs, (640, 480))
        np.testing.assert_allclose(Ke[0, 0], K[0, 0], rtol=0.05)
        np.testing.assert_allclose(Ke[1, 1], K[1, 1], rtol=0.05)
        np.testing.assert_allclose(Ke[0, 2], K[0, 2], rtol=0.1)


class TestCalibrationService:
    """The service layer behind the /calibration UI panels."""

    def test_maybe_feed_keyframe_gating(self):
        from lsd_tpu.calibration.service import _TrajectoryCalib
        c = _TrajectoryCalib()
        T = np.eye(4)
        assert c.maybe_feed(T, T) == 1
        assert c.maybe_feed(T, T) == 1          # no motion -> gated
        T2 = np.eye(4); T2[0, 3] = 3.0
        assert c.maybe_feed(T2, T2) == 2        # 3 m > 2 m gate
        T3 = T2.copy()
        th = np.deg2rad(20)
        T3[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        assert c.maybe_feed(T3, T3) == 3        # 20 deg > 15 deg gate

    def test_fix_to_pose_local_frame(self):
        from lsd_tpu.calibration.service import _TrajectoryCalib, _fix_to_pose
        c = _TrajectoryCalib()
        f0 = dict(latitude=42.0, longitude=-83.0, altitude=10.0, heading=90.0)
        T0 = _fix_to_pose(c, f0)
        np.testing.assert_allclose(T0[:3, 3], 0.0, atol=1e-9)
        # heading 90 NED = ENU yaw 0 -> identity rotation
        np.testing.assert_allclose(T0[:3, :3], np.eye(3), atol=1e-9)
        # ~1.1 m north per 1e-5 deg latitude
        f1 = dict(latitude=42.0 + 1e-4, longitude=-83.0, altitude=12.0,
                  heading=0.0)
        T1 = _fix_to_pose(c, f1)
        assert 10.0 < T1[1, 3] < 12.5 and abs(T1[0, 3]) < 0.5
        assert abs(T1[2, 3] - 2.0) < 1e-6
        # heading 0 NED (north) = ENU yaw 90
        assert abs(np.degrees(np.arctan2(T1[1, 0], T1[0, 0])) - 90) < 1e-6
        # missing fix -> None
        assert _fix_to_pose(c, {}) is None

    def test_lidar_delta_skips_missing_entry(self):
        from lsd_tpu.calibration.service import (calibrate_heading,
                                                 finetune_lidar)
        cfg = {}    # replay session: no live lidar list
        dT, cfg2 = finetune_lidar(cfg, 0, np.eye(4).flatten().tolist())
        assert len(dT) == 16 and cfg2 == {}
        th = np.deg2rad(10)
        src = [[1, 0], [0, 1], [5, 5]]
        tgt = [(np.cos(th) * x - np.sin(th) * y,
                np.sin(th) * x + np.cos(th) * y) for x, y in src]
        dT, _ = calibrate_heading(cfg, src, tgt, 0)
        yaw = np.degrees(np.arctan2(dT[4], dT[0]))
        np.testing.assert_allclose(yaw, 10.0, atol=1e-6)
        # and with a real entry the extrinsic is composed
        cfg = {"lidar": [{"extrinsic_parameters": [0, 0, 0, 0, 0, 0]}]}
        _, cfg2 = calibrate_heading(cfg, src, tgt, 0)
        assert abs(cfg2["lidar"][0]["extrinsic_parameters"][5] - 10.0) < 1e-4

    def test_json_positions_getters(self):
        from lsd_tpu.calibration.service import (
            _imu_calib, _ins_calib, lidar_imu_get_positions,
            lidar_ins_get_positions)
        _ins_calib.reset([0, 0, 0, 0, 0, 0])
        _imu_calib.reset([0, 0, 0, 0, 0, 0])
        T = np.eye(4); T[0, 3] = 1.0
        _ins_calib.feed(T, np.eye(4))
        d = lidar_ins_get_positions()
        assert d["lidar"] == [[1.0, 0.0, 0.0]] and d["ref"] == [[0, 0, 0]]
        assert lidar_imu_get_positions() == {"lidar": [], "ref": []}

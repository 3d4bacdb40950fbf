import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsd_tpu.sim import CircleSim, SimConfig
from lsd_tpu.slam import LioConfig, lio_init, lio_step
from lsd_tpu.slam.state import init_state, boxplus, boxminus, ERR_DIM
from lsd_tpu.slam.imu import ImuNoise, propagate, static_init, undistort, rot_between
from lsd_tpu.geometry import so3


def gt_init_state(sim, t=0.0):
    R, p = sim.pose(t)
    return init_state()._replace(
        pos=jnp.asarray(p, jnp.float32),
        quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
        vel=jnp.asarray(sim.velocity(t), jnp.float32),
    )


class TestState:
    def test_boxplus_boxminus_roundtrip(self):
        x = init_state()
        dx = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, ERR_DIM), jnp.float32)
        y = boxplus(x, dx)
        dx2 = boxminus(y, x)
        np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx), atol=1e-4)


class TestImu:
    def test_propagation_tracks_analytic_trajectory(self):
        sim = CircleSim(SimConfig(n_scans=1))
        st = gt_init_state(sim)
        P = jnp.eye(ERR_DIM) * 1e-6
        # propagate through 2 seconds of exact IMU
        for k in range(20):
            imu = sim.imu_batch(k * 0.1).astype(np.float32)
            mask = np.ones(len(imu), bool)
            st, P, _ = propagate(st, P, jnp.asarray(imu), jnp.asarray(mask), ImuNoise())
        R_gt, p_gt = sim.pose(2.0)
        assert np.linalg.norm(np.asarray(st.pos) - p_gt) < 0.05
        dR = np.asarray(st.rot).T @ R_gt
        assert np.abs(np.trace(dR) - 3.0) < 1e-3

    def test_static_init(self):
        rng = np.random.default_rng(1)
        # stationary, tilted 10 degrees about x; accel in g units
        R_wb = np.asarray(so3.exp_so3(jnp.array([0.17, 0.0, 0.0])))
        acc_b = R_wb.T @ np.array([0.0, 0.0, 1.0])
        samples = np.concatenate([
            np.linspace(0, 0.2, 21)[:, None],
            np.tile([0.001, -0.002, 0.0005], (21, 1)) + rng.normal(0, 1e-4, (21, 3)),
            np.tile(acc_b, (21, 1)) + rng.normal(0, 1e-4, (21, 3)),
        ], axis=1)
        st, scale = static_init(samples)
        np.testing.assert_allclose(np.asarray(st.bg), [0.001, -0.002, 0.0005], atol=1e-3)
        assert abs(scale - 9.81) < 0.05
        # estimated attitude must map measured accel dir to +z
        up = np.asarray(st.rot) @ acc_b
        np.testing.assert_allclose(up, [0, 0, 1], atol=1e-3)

    def test_undistort_recovers_static_points(self):
        # rotating sensor, static world point: after undistortion all copies
        # land at the same scan-end-frame location
        sim = CircleSim(SimConfig(points_per_scan=4096))
        pts, stamps = sim.scan(0.0)
        st0 = gt_init_state(sim)
        P = jnp.eye(ERR_DIM) * 1e-6
        imu = jnp.asarray(sim.imu_batch(0.0).astype(np.float32))
        mask = jnp.ones(len(imu), bool)
        nav_end, _, track = propagate(st0, P, imu, mask, ImuNoise())
        und = undistort(jnp.asarray(pts), jnp.asarray(stamps),
                        jnp.ones(len(pts), bool), nav_end, track)
        # re-project to world with scan-end pose; compare to raw projection error
        R_end, p_end = np.asarray(nav_end.rot), np.asarray(nav_end.pos)
        pw_und = np.asarray(und) @ R_end.T + p_end
        pw_raw = np.asarray(pts) @ R_end.T + p_end
        R_gt, p_gt = sim.pose(0.1)
        # ground-truth world points: invert per-point capture transform is the
        # sim's job; just assert undistortion reduces spread vs ground truth
        d2w = sim.world  # nearest-neighbor distance to true world surface
        from scipy.spatial import cKDTree
        tree = cKDTree(d2w)
        err_und = tree.query(pw_und, k=1)[0].mean()
        err_raw = tree.query(pw_raw, k=1)[0].mean()
        assert err_und < 0.05
        assert err_und < err_raw * 0.5

    def test_rot_between(self):
        a = jnp.array([0.0, 0.0, 1.0])
        b = jnp.array([1.0, 0.0, 0.0])
        R = rot_between(a, b)
        np.testing.assert_allclose(np.asarray(R @ a), np.asarray(b), atol=1e-6)


class TestLio:
    def _run(self, sim_cfg, lio_cfg, n_scans, init_vel_err=0.0):
        sim = CircleSim(sim_cfg)
        data = sim.generate(capacity=8192, imu_capacity=16)
        nav0 = gt_init_state(sim)
        if init_vel_err:
            nav0 = nav0._replace(vel=nav0.vel + init_vel_err)
        st = lio_init(lio_cfg, nav0)
        errs, gts, est = [], [], []
        for (P_, S_, M_, I_, IM_, T_gt) in data[:n_scans]:
            st, info = lio_step(lio_cfg, st,
                                jnp.asarray(P_), jnp.asarray(S_), jnp.asarray(M_),
                                jnp.asarray(I_), jnp.asarray(IM_))
            est.append(np.asarray(info["pose"]))
            gts.append(T_gt)
            errs.append(np.linalg.norm(np.asarray(st.nav.pos) - T_gt[:3, 3]))
        return np.asarray(errs), est, gts, st

    @pytest.mark.slow
    def test_tracks_circle_exact_imu(self):
        sim_cfg = SimConfig(n_scans=30, points_per_scan=8192, seed=3)
        lio_cfg = LioConfig(ds_capacity=4096, map_capacity=2 ** 15,
                            scan_voxel=0.4, map_voxel=0.4)
        errs, est, gts, st = self._run(sim_cfg, lio_cfg, 30)
        ate = np.sqrt(np.mean(errs ** 2))
        assert ate < 0.15, f"ATE {ate:.3f} m too high: {errs}"
        assert errs[-1] < 0.2

    @pytest.mark.slow
    def test_tracks_with_noise(self):
        sim_cfg = SimConfig(n_scans=30, points_per_scan=8192, seed=4,
                            point_noise=0.02, gyro_noise=0.002, acc_noise=0.002)
        lio_cfg = LioConfig(ds_capacity=4096, map_capacity=2 ** 15,
                            scan_voxel=0.4, map_voxel=0.4)
        errs, est, gts, st = self._run(sim_cfg, lio_cfg, 30)
        ate = np.sqrt(np.mean(errs ** 2))
        assert ate < 0.3, f"noisy ATE {ate:.3f} m too high"

    @pytest.mark.slow
    def test_lio_corrects_bad_velocity(self):
        # start with a 0.5 m/s velocity error: scan matching must pull it back
        sim_cfg = SimConfig(n_scans=20, points_per_scan=8192, seed=5)
        lio_cfg = LioConfig(ds_capacity=4096, map_capacity=2 ** 15,
                            scan_voxel=0.4, map_voxel=0.4)
        errs, est, gts, st = self._run(sim_cfg, lio_cfg, 20, init_vel_err=0.5)
        assert errs[-1] < 0.3, f"did not recover: {errs}"


@pytest.mark.slow
def test_lio_step_batch_matches_sequential():
    """lio_step_batch (K scans per dispatch) must track the sequential
    single-scan path; tiny float divergence is allowed (different fusion
    order inside lax.scan)."""
    import jax
    from lsd_tpu.slam import lio_step_batch
    sim = CircleSim(SimConfig(n_scans=9, points_per_scan=4096, seed=12))
    data = sim.generate(capacity=4096, imu_capacity=16)
    R, p = sim.pose(0.0)
    nav0 = init_state()._replace(
        pos=jnp.asarray(p, jnp.float32),
        quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
        vel=jnp.asarray(sim.velocity(0.0), jnp.float32))
    cfg = LioConfig(ds_capacity=2048, map_capacity=2 ** 14,
                    scan_voxel=0.4, map_voxel=0.4)
    st_seq = lio_init(cfg, nav0)
    seq_poses = []
    for (P_, S_, M_, I_, IM_, _) in data:
        st_seq, info = lio_step(cfg, st_seq, jnp.asarray(P_), jnp.asarray(S_),
                                jnp.asarray(M_), jnp.asarray(I_),
                                jnp.asarray(IM_))
        seq_poses.append(np.asarray(info["pose"]))

    st_b = lio_init(cfg, nav0)
    import numpy as _np
    batch = [ _np.stack([_np.asarray(d[i]) for d in data]) for i in range(5)]
    st_b, poses = lio_step_batch(cfg, st_b, *map(jnp.asarray, batch))
    poses = np.asarray(jax.device_get(poses))
    assert poses.shape == (9, 4, 4)
    for k in range(9):
        assert np.linalg.norm(poses[k][:3, 3] - seq_poses[k][:3, 3]) < 1e-2, k
    # final states agree
    assert np.linalg.norm(np.asarray(st_b.nav.pos) -
                          np.asarray(st_seq.nav.pos)) < 1e-2


@pytest.mark.slow
def test_get_timed_pose_interpolates_between_scans():
    """High-rate pose (ref getTimedPose): interpolating the IMU-propagated
    per-sample trajectory must land between consecutive scan poses."""
    from lsd_tpu.slam import Mapper, MapperConfig
    sim = CircleSim(SimConfig(radius=8.0, omega=0.8, n_scans=12,
                              points_per_scan=4096, seed=4))
    data = sim.generate(capacity=4096, imu_capacity=16)
    R, p = sim.pose(0.0)
    nav0 = init_state()._replace(
        pos=jnp.asarray(p, jnp.float32),
        quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
        vel=jnp.asarray(sim.velocity(0.0), jnp.float32))
    m = Mapper(MapperConfig(lio=LioConfig(ds_capacity=2048,
                                          map_capacity=2 ** 14,
                                          scan_voxel=0.4, map_voxel=0.4)),
               nav0=nav0)
    poses = []
    for k, (P_, S_, M_, I_, IM_, _T) in enumerate(data):
        out = m.process_scan(P_, S_, M_, I_, IM_, stamp_us=int(k * 1e5))
        poses.append(out["pose"])
    # mid-scan query: between scan 10 end and scan 11 end
    T_mid = m.get_timed_pose(int(11 * 1e5 + 5e4))
    assert T_mid is not None
    # position should be within the motion envelope around the last poses
    d_prev = np.linalg.norm(T_mid[:3, 3] - poses[-1][:3, 3])
    assert d_prev < 1.0, d_prev
    # extrapolation beyond the track moves along the velocity
    T_far = m.get_timed_pose(int(11 * 1e5 + 3e5))
    assert np.linalg.norm(T_far[:3, 3] - poses[-1][:3, 3]) > \
        np.linalg.norm(T_mid[:3, 3] - poses[-1][:3, 3]) * 0.5

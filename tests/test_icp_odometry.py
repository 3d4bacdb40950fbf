import numpy as np
import pytest

from lsd_tpu.sim import CircleSim, SimConfig
from lsd_tpu.slam.icp_odometry import IcpOdometry, IcpOdometryConfig


@pytest.mark.slow
class TestIcpOdometry:
    def test_tracks_without_imu(self):
        # slow motion so constant-velocity prediction stays in the basin
        sim = CircleSim(SimConfig(radius=10.0, omega=0.15, n_scans=25,
                                  points_per_scan=8192, seed=66))
        data = sim.generate(capacity=8192, imu_capacity=16)
        odo = IcpOdometry(IcpOdometryConfig(ds_capacity=4096,
                                            map_capacity=2 ** 16,
                                            scan_voxel=0.4, map_voxel=0.4))
        # anchor: first pose is identity in odo frame; compare RELATIVE motion
        T0_gt = data[0][5]
        errs = []
        for k, (P_, S_, M_, I_, IM_, T_gt) in enumerate(data):
            out = odo.process_scan(P_, M_)
            # odometry frame: T_odo ~ inv(T0_gt) @ T_gt
            T_expect = np.linalg.inv(T0_gt) @ T_gt
            errs.append(np.linalg.norm(out["pose"][:3, 3] - T_expect[:3, 3]))
        ate = np.sqrt(np.mean(np.square(errs[2:])))
        assert ate < 0.35, f"lidar-only ATE {ate:.3f}: {errs}"

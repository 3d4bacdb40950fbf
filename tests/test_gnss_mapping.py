"""BASELINE config #3 semantics: LIO with GNSS factors + outlier-gated PGO."""
import numpy as np
import jax.numpy as jnp
import pytest

from lsd_tpu.geometry import so3
from lsd_tpu.sim import CircleSim, SimConfig
from lsd_tpu.slam import LioConfig, Mapper, MapperConfig
from lsd_tpu.slam.state import init_state


@pytest.mark.slow
class TestGnssMapping:
    def test_mapping_with_gps_priors_and_outliers(self):
        sim = CircleSim(SimConfig(radius=8.0, omega=0.8, n_scans=50,
                                  points_per_scan=4096, seed=88,
                                  gyro_noise=0.003, acc_noise=0.005,
                                  point_noise=0.01))
        data = sim.generate(capacity=4096, imu_capacity=16)
        R, p = sim.pose(0.0)
        nav0 = init_state()._replace(
            pos=jnp.asarray(p, jnp.float32),
            quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
            vel=jnp.asarray(sim.velocity(0.0), jnp.float32))
        cfg = MapperConfig(lio=LioConfig(ds_capacity=2048, map_capacity=2 ** 15,
                                         scan_voxel=0.4, map_voxel=0.4),
                           keyframe_delta_trans=1.5, optimize_every=8,
                           gps_info=1.0)
        m = Mapper(cfg)
        m.lio_state = m.lio_state._replace(nav=nav0)
        rng = np.random.default_rng(0)
        for k, (P_, S_, M_, I_, IM_, T_gt) in enumerate(data):
            gps = T_gt[:3, 3] + rng.normal(0, 0.05, 3)
            if k in (12, 30):                 # gross GNSS outliers (20 m)
                gps = gps + np.asarray([20.0, -15.0, 0.0])
            m.process_scan(P_, S_, M_, I_, IM_, stamp_us=int(k * 1e5),
                           gps_xyz=gps)
        m.optimize_graph()
        # every keyframe must sit on the true circle despite the outliers
        pos = m.store.positions()
        r = np.linalg.norm(pos[:, :2], axis=1)
        assert np.all(np.abs(r - 8.0) < 0.5), f"radii {r.min():.2f}..{r.max():.2f}"
        assert len(m.graph.gps) >= len(m.store) - 1


@pytest.mark.slow
def test_runtime_wires_ins_into_gps_priors():
    """SlamModule must convert valid INS fixes into graph GPS priors,
    anchor origin_lla at the first fix, and pass the velocity observation
    (ref slam.cpp feedInsData + wheelspeed path)."""
    import numpy as np
    from lsd_tpu.runtime import clear_interfaces
    from lsd_tpu.runtime.config import ConfigManager
    from lsd_tpu.runtime.modules import SlamModule
    from tests.test_io import make_frame_dict

    clear_interfaces()
    cfg = ConfigManager().config
    cfg["slam"]["key_frames_interval"] = [0.0, 0.0]   # keyframe every frame
    m = SlamModule(cfg)
    m.setup(cfg)
    rng = np.random.default_rng(2)
    # RTK-fixed status (42) upgrades after its 1 s stable_time
    # (sensors/ins_status.py state machine)
    for k in range(12):
        d = make_frame_dict(ts=1_000_000 + k * 200_000, n=2048)
        d["points"]["0-Ouster-OS1"] = (
            rng.normal(size=(2048, 4)) * [10, 10, 2, 1]).astype(np.float32)
        d["ins_data"]["Status"] = 42
        # ~1.1 m north per 1e-5 deg latitude
        d["ins_data"]["latitude"] = 42.0 + k * 2e-5
        d["ins_data"]["heading"] = 90.0      # due east (NED) -> ENU yaw 0
        m.process(d)
    eng = m.engine
    assert eng.origin_lla is not None
    # the anchor is the FIRST TRUSTED fix (after the stable-time
    # upgrade), slightly north of the very first sample
    np.testing.assert_allclose(eng.origin_lla[:2], [42.0, -83.0], atol=3e-4)
    assert len(eng.graph.gps) >= 1           # priors attached to keyframes
    # prior positions follow the northward motion
    xyz = np.stack([g[1] for g in eng.graph.gps])
    assert np.all(np.isfinite(xyz))
    # INS attitude produced orientation priors alongside the GPS priors
    # (ref hdl_graph_slam_nodelet.cpp:462-521); heading 90 NED = yaw 0 ENU
    # -> identity prior quaternion
    assert len(eng.graph.orient) >= 1
    q = np.asarray(eng.graph.orient[-1][1])
    np.testing.assert_allclose(np.abs(q), [1.0, 0, 0, 0], atol=5e-3)
    clear_interfaces()

import socket
import numpy as np
import jax.numpy as jnp
import pytest

from lsd_tpu.detection.accumulate import FrameAccumulator
from lsd_tpu.io.gpchc import parse_gpchc
from lsd_tpu.slam.loc_output import LocalizationOutput


class TestAccumulator:
    def test_two_frame_accumulation_compensates_motion(self):
        acc = FrameAccumulator(num_frames=2, capacity_per_frame=128)
        # world point at x=10; ego at origin then moves +1 in x
        p0 = np.asarray([[10.0, 0, 0, 0.5]], np.float32)
        out, m = acc.push(p0, np.ones(1, bool))
        assert m.sum() == 1
        # frame 2: ego moved +1x; the same world point is now at x=9 in
        # the new frame; motion = inv(T_prev) @ T_curr = translation +1
        motion = np.eye(4)
        motion[0, 3] = 1.0
        p1 = np.asarray([[9.0, 0, 0, 0.5]], np.float32)
        out, m = acc.push(p1, np.ones(1, bool), motion=motion)
        assert m.sum() == 2
        pts = out[m]
        # both copies must land at x=9 in the current frame
        np.testing.assert_allclose(sorted(pts[:, 0].tolist()), [9.0, 9.0], atol=1e-5)
        assert set(pts[:, 4].tolist()) == {0.0, 1.0}

    def test_history_depth_bounded(self):
        acc = FrameAccumulator(num_frames=2, capacity_per_frame=16)
        for k in range(5):
            out, m = acc.push(np.ones((4, 4), np.float32), np.ones(4, bool),
                              motion=np.eye(4))
        assert len(acc.history) == 2
        assert int(m.sum()) == 8


class TestLocOutput:
    def test_gpchc_udp_roundtrip(self):
        rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rx.bind(("127.0.0.1", 0))
        rx.settimeout(2.0)
        port = rx.getsockname()[1]
        out = LocalizationOutput("127.0.0.1", port,
                                 origin_lla=np.asarray([42.0, -83.0, 200.0]))
        T = np.eye(4)
        T[:3, 3] = (10.0, 5.0, 1.0)
        s = out.emit(1700000000 * 1000000, T)
        assert s is not None and s.startswith("$GPCHC")
        data, _ = rx.recvfrom(4096)
        fix = parse_gpchc(data.decode())
        assert fix is not None
        # 10 m east / 5 m north of the anchor
        assert abs(fix["longitude"] - (-83.0)) > 1e-6
        assert fix["latitude"] > 42.0
        np.testing.assert_allclose(fix["altitude"], 201.0, atol=1e-3)

    def test_rtk_passthrough_fallback(self):
        rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        rx.bind(("127.0.0.1", 0))
        rx.settimeout(2.0)
        out = LocalizationOutput("127.0.0.1", rx.getsockname()[1])
        fix = dict(timestamp=1700000000 * 1000000, latitude=42.5, longitude=-83.5,
                   altitude=100.0, heading=10.0, pitch=0.0, roll=0.0,
                   Ve=0.0, Vn=0.0, Vu=0.0, Status=4)
        s = out.emit(fix["timestamp"], None, ins_fix=fix)
        assert s is not None
        back = parse_gpchc(rx.recv(4096).decode())
        np.testing.assert_allclose(back["latitude"], 42.5, atol=1e-8)

    def test_metric_only_map_no_anchor(self):
        out = LocalizationOutput("127.0.0.1", 19999)
        assert out.emit(0, np.eye(4)) is None


@pytest.mark.slow
class TestFloorPrior:
    def test_floor_prior_counters_z_drift(self):
        from lsd_tpu.sim import CircleSim, SimConfig
        from lsd_tpu.slam import LioConfig, Mapper, MapperConfig
        from lsd_tpu.slam.state import init_state
        from lsd_tpu.geometry import so3
        sim = CircleSim(SimConfig(radius=8.0, omega=0.8, n_scans=30,
                                  points_per_scan=4096, seed=55))
        data = sim.generate(capacity=4096, imu_capacity=16)
        R, p = sim.pose(0.0)
        nav0 = init_state()._replace(
            pos=jnp.asarray(p, jnp.float32),
            quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
            vel=jnp.asarray(sim.velocity(0.0), jnp.float32))
        cfg = MapperConfig(lio=LioConfig(ds_capacity=2048, map_capacity=2 ** 15,
                                         scan_voxel=0.4, map_voxel=0.4),
                           keyframe_delta_trans=1.5, optimize_every=8,
                           use_floor_prior=True)
        m = Mapper(cfg)
        m.lio_state = m.lio_state._replace(nav=nav0)
        for k, (P_, S_, M_, I_, IM_, _) in enumerate(data):
            m.process_scan(P_, S_, M_, I_, IM_, stamp_us=int(k * 1e5))
        assert len(m.graph.floor) >= 3   # floor factors attached
        m.optimize_graph()
        zs = [kf.pose[2, 3] for kf in m.store.frames]
        # sim sensor height is 1.8 m over flat ground: z spread stays tight
        assert np.std(zs) < 0.15, f"z spread {np.std(zs)}"

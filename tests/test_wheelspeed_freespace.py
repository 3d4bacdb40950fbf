import numpy as np
import jax.numpy as jnp
import pytest

from lsd_tpu.detection.freespace import seg_to_freespace
from lsd_tpu.proto import parse_detection, serialize_detection
from lsd_tpu.sim import CircleSim, SimConfig
from lsd_tpu.slam import LioConfig, lio_init, lio_step
from lsd_tpu.slam.state import init_state
from lsd_tpu.geometry import so3


class TestWheelspeedObservation:
    @pytest.mark.slow
    def test_velocity_observation_constrains_drift(self):
        """With NO usable geometry (tiny residual budget/empty map) the
        wheelspeed/INS velocity observation must keep velocity bounded."""
        sim = CircleSim(SimConfig(n_scans=10, points_per_scan=2048, seed=9,
                                  gyro_noise=0.01, acc_noise=0.02))
        data = sim.generate(capacity=2048, imu_capacity=16)
        R, p = sim.pose(0.0)
        nav0 = init_state()._replace(
            pos=jnp.asarray(p, jnp.float32),
            quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
            vel=jnp.asarray(sim.velocity(0.0), jnp.float32))
        cfg = LioConfig(ds_capacity=1024, map_capacity=2 ** 12)

        def run(use_vel):
            st = lio_init(cfg, nav0)
            for k, (P_, S_, M_, I_, IM_, T_gt) in enumerate(data):
                # destroy the geometry signal: masked-out scan
                M0 = jnp.zeros_like(jnp.asarray(M_))
                v_gt = jnp.asarray(sim.velocity(k * 0.1 + 0.1), jnp.float32)
                st, info = lio_step(cfg, st, jnp.asarray(P_), jnp.asarray(S_), M0,
                                    jnp.asarray(I_), jnp.asarray(IM_),
                                    vel_obs=v_gt if use_vel else None,
                                    vel_obs_valid=jnp.asarray(use_vel))
            v_err = np.linalg.norm(np.asarray(st.nav.vel) -
                                   sim.velocity(len(data) * 0.1))
            return v_err

        err_without = run(False)
        err_with = run(True)
        assert err_with < 0.2, f"vel obs did not constrain: {err_with}"
        assert err_with <= err_without + 1e-6


class TestFreespace:
    def test_seg_to_freespace_and_proto(self):
        H, W = 32, 32
        logits = np.full((H, W, 1), -5.0, np.float32)
        logits[8:16, 8:16] = 5.0
        fs = seg_to_freespace(logits, (-16, -16, -3, 16, 16, 3), 1.0)
        assert fs["x_num"] == W and fs["y_num"] == H
        cells = np.frombuffer(fs["cells"], np.uint8).reshape(H, W)
        assert cells.sum() == 64
        # ships through the Detection wire format
        data = serialize_detection(dict(timestamp=1, objects=[], freespace=fs))
        out = parse_detection(data)
        assert "freespace" in out
        from lsd_tpu.proto.detection import FREESPACE
        from lsd_tpu.proto.wire import decode_message
        fmsg = decode_message(FREESPACE, out["freespace"])
        assert fmsg["info"]["x_num"] == W
        assert len(fmsg["cells"]) == H * W


class TestWheelspeedTunnel:
    @pytest.mark.slow
    def test_tunnel_along_axis_tracked_with_wheelspeed(self):
        """Featureless-tunnel regression (EVAL r5): motion-aliased scans
        inject fake along-axis information that outweighed the fixed-
        weight velocity row (~4 % velocity bias, 0.9 m drift over 12 s).
        With the reference's count-scaled wheelspeed weighting
        (laserMapping.cpp:994-1006), the along-axis error must stay at
        the centimeter level."""
        from lsd_tpu.sim import CorridorSim
        sim = CorridorSim(SimConfig(n_scans=120, points_per_scan=4096,
                                    point_noise=0.01, seed=7,
                                    rest_time=1.5, ramp_time=1.0,
                                    feature_density=0.0))
        data = sim.generate(capacity=4096, imu_capacity=16)
        cfg = LioConfig(ds_capacity=4096, map_capacity=2 ** 16,
                        scan_voxel=0.4, map_voxel=0.4, max_iters=4)
        st = lio_init(cfg)
        period = 1.0 / sim.cfg.scan_hz
        worst_x = 0.0
        for k, (P_, S_, M_, I_, IM_, T_gt) in enumerate(data):
            vel = jnp.asarray(sim.velocity((k + 1) * period),
                              jnp.float32)
            st, info = lio_step(cfg, st, jnp.asarray(P_),
                                jnp.asarray(S_), jnp.asarray(M_),
                                jnp.asarray(I_), jnp.asarray(IM_),
                                vel_obs=vel,
                                vel_obs_valid=jnp.asarray(True))
            if k > 27:
                xerr = abs(float(st.nav.pos[0]) - float(T_gt[0, 3]))
                worst_x = max(worst_x, xerr)
        assert worst_x < 0.15, f"tunnel x-drift {worst_x:.3f} m"

"""RTKM mode: GNSS-interpolated mapping with no LiDAR odometry
(ref slam/mapping/rtkm/src/rtkm.cpp)."""
import numpy as np
import pytest

from lsd_tpu.slam import LioConfig, MapperConfig, RtkMapper


def _fix(ts_us, lat, lon=-83.0, heading=0.0, alt=100.0):
    return dict(timestamp=ts_us, latitude=lat, longitude=lon,
                altitude=alt, heading=heading, pitch=0.0, roll=0.0,
                Status=42)


def _scan(rng, n=2048):
    pts = (rng.normal(size=(n, 3)) * [15, 15, 2]).astype(np.float32)
    stamps = rng.uniform(0, 0.1, n).astype(np.float32)
    return pts, stamps, np.ones(n, bool)


def test_rtkm_interpolates_and_maps():
    cfg = MapperConfig(lio=LioConfig(), keyframe_delta_trans=1.0)
    m = RtkMapper(cfg)
    rng = np.random.default_rng(0)

    # before any fixes: waiting
    P, S, M = _scan(rng)
    out = m.process_scan(P, S, M, stamp_us=0)
    assert out["status"] == "waiting_rtk" and out["pose"] is None

    # drive north at ~1.1 m per 1e-5 deg, 10 Hz fixes
    for k in range(30):
        m.feed_ins(_fix(k * 100_000, 42.0 + k * 2e-5))
    assert m.origin_lla is not None

    poses = []
    for k in range(2, 25):
        P, S, M = _scan(rng)
        out = m.process_scan(P, S, M, stamp_us=k * 100_000)
        assert out["pose"] is not None
        poses.append(out["pose"])
    poses = np.stack(poses)
    # northward motion (~22 m/s here); the small east component is the
    # genuine UTM meridian convergence at 2 deg from the zone center
    d = poses[-1][:3, 3] - poses[0][:3, 3]
    assert d[1] > 40.0 and abs(d[0]) < 0.03 * d[1], d
    # keyframes were gated in and carry graph nodes
    assert len(m.store) >= 3
    assert m.graph.num_nodes == len(m.store)
    # heading 0 (NED north) -> ENU yaw 90: body x points +y
    R = poses[-1][:3, :3]
    assert abs(R[1, 0] - 1.0) < 0.05


def test_rtkm_pose_matches_interpolation_midpoint():
    m = RtkMapper(MapperConfig())
    m.feed_ins(_fix(0, 42.0))
    m.feed_ins(_fix(200_000, 42.0 + 4e-5))
    T = m.interpolate(100_000)
    T0 = m.interpolate(0)
    T1 = m.interpolate(200_000)
    np.testing.assert_allclose(T[:3, 3], 0.5 * (T0[:3, 3] + T1[:3, 3]),
                               atol=1e-6)


def test_runtime_selects_rtk_mapper():
    from lsd_tpu.runtime import clear_interfaces
    from lsd_tpu.runtime.config import ConfigManager
    from lsd_tpu.runtime.modules import SlamModule
    clear_interfaces()
    cfg = ConfigManager().config
    cfg["slam"]["method"] = "RTKM"
    mod = SlamModule(cfg)
    mod.setup(cfg)
    assert isinstance(mod.engine, RtkMapper)
    clear_interfaces()

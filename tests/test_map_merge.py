import numpy as np
import jax.numpy as jnp
import pytest

from lsd_tpu.geometry import so3
from lsd_tpu.sim import CircleSim, SimConfig
from lsd_tpu.slam import LioConfig, Mapper, MapperConfig, map_io
from lsd_tpu.slam.map_merge import find_cross_edges, merge_maps
from lsd_tpu.slam.state import init_state


def run_mapping(sim, scans, tmp, name, t_offset=0.0):
    data = sim.generate(capacity=8192, imu_capacity=16, t_start=t_offset)
    R, p = sim.pose(t_offset)
    nav0 = init_state()._replace(
        pos=jnp.asarray(p, jnp.float32),
        quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
        vel=jnp.asarray(sim.velocity(t_offset), jnp.float32))
    cfg = MapperConfig(lio=LioConfig(ds_capacity=4096, map_capacity=2 ** 16,
                                     scan_voxel=0.4, map_voxel=0.4),
                       keyframe_delta_trans=1.5, optimize_every=100)
    m = Mapper(cfg)
    m.lio_state = m.lio_state._replace(nav=nav0)
    for k, (P_, S_, M_, I_, IM_, T_gt) in enumerate(data[:scans]):
        m.process_scan(P_, S_, M_, I_, IM_, stamp_us=int((t_offset + k * 0.1) * 1e6))
    d = str(tmp / name)
    m.save(d)
    return d


@pytest.mark.slow
class TestMapMerge:
    def test_merge_two_sessions(self, tmp_path):
        # two half-laps of the same world, overlapping around the start
        sim = CircleSim(SimConfig(radius=8.0, omega=0.8, n_scans=45,
                                  points_per_scan=8192, seed=33))
        da = run_mapping(sim, 45, tmp_path, "a")
        # session B: SAME world, starting 1/4 lap later (overlaps A's arc)
        sim2 = CircleSim(SimConfig(radius=8.0, omega=0.8, n_scans=45,
                                   points_per_scan=8192, seed=33))
        db = run_mapping(sim2, 45, tmp_path, "b", t_offset=2.0)

        out = merge_maps(da, db, out_dir=str(tmp_path / "merged"))
        assert out["cross_edges"], "no cross-session matches"
        merged = out["store"]
        assert len(merged) == out["n_a"] + out["n_b"]
        # after merging, B keyframes that revisit A's area must land near
        # the true circle (radius 8, z = 1.8)
        pos = merged.positions()
        r = np.linalg.norm(pos[:, :2], axis=1)
        assert np.all(np.abs(r - 8.0) < 1.0), f"radii {r.min()} {r.max()}"
        # saved merged map loads
        back = map_io.load_map(str(tmp_path / "merged"))
        assert len(back["poses"]) == len(merged)


class TestGnssAnchoredMerge:
    """GNSS-anchored maps must merge on their shared world frame, not on a
    single cross edge (r5 TPU campaign: one-edge rigid re-anchoring warped
    session B by 4.7 m while both inputs sat at <6 cm absolute error)."""

    def _write_map(self, tmp_path, name, offset_xy, origin_lla,
                   anchor=(0.0, 0.0, 0.0), n=12):
        rng = np.random.default_rng(3)
        stamps, poses, clouds = [], [], []
        base_cloud = rng.normal(0, 5, (600, 4)).astype(np.float32)
        for k in range(n):
            T = np.eye(4)
            T[0, 3] = offset_xy[0] + 2.0 * k
            T[1, 3] = offset_xy[1]
            stamps.append(1_000_000 * (k + 1))
            poses.append(T)
            clouds.append(base_cloud)
        edges = []
        for k in range(n - 1):
            T_rel = np.linalg.inv(poses[k]) @ poses[k + 1]
            edges.append((k, k + 1, T_rel, np.full(6, 1e-4)))
        d = str(tmp_path / name)
        map_io.save_map(d, np.asarray(origin_lla, float), stamps, poses,
                        clouds, edges, fixed=[0],
                        meta={"area": [],
                              "origin_anchor_xyz": list(anchor)})
        return d

    def test_expected_alignment_from_origins(self, tmp_path):
        from lsd_tpu.slam.map_io import load_map
        from lsd_tpu.slam.map_merge import _gnss_expected_alignment
        # B's origin fix sits ~111 m north of A's (1e-3 deg latitude)
        da_dir = self._write_map(tmp_path, "ga", (0, 0), (40.0, 116.0, 10.0))
        db_dir = self._write_map(tmp_path, "gb", (0, 0), (40.001, 116.0, 10.0))
        T = _gnss_expected_alignment(load_map(da_dir), load_map(db_dir))
        assert T is not None
        # northing ~111 m; easting picks up UTM grid convergence (~1.2 m
        # at lon 116 for this step — real projection behavior, not error)
        assert abs(T[1, 3] - 111.0) < 1.0 and abs(T[0, 3]) < 2.0

    def test_no_origin_means_no_expected_alignment(self, tmp_path):
        from lsd_tpu.slam.map_io import load_map
        from lsd_tpu.slam.map_merge import _gnss_expected_alignment
        da_dir = self._write_map(tmp_path, "na", (0, 0), (0.0, 0.0, 0.0))
        db_dir = self._write_map(tmp_path, "nb", (0, 0), (40.0, 116.0, 0.0))
        assert _gnss_expected_alignment(load_map(da_dir),
                                        load_map(db_dir)) is None

    def test_anchored_merge_keeps_world_placement(self, tmp_path, monkeypatch):
        """Even when cross-edge search returns ONE aliased match implying a
        5 m-off alignment, anchored maps must merge at their world poses
        (the aliased edge is gated out against the GNSS alignment)."""
        import lsd_tpu.slam.map_merge as mm
        da_dir = self._write_map(tmp_path, "wa", (0, 0),
                                 (40.0, 116.0, 10.0))
        # same datum: B overlaps A shifted 4 m in x (same world frame)
        db_dir = self._write_map(tmp_path, "wb", (4.0, 0.0),
                                 (40.0, 116.0, 10.0))

        def aliased_edges(store_a, store_b, **kw):
            # one high-"confidence" edge claiming B sits 5 m off in y
            T_rel = np.linalg.inv(store_a.frames[0].pose) @ \
                (store_b.frames[0].pose + 0)
            T_rel[1, 3] += 5.0
            return [(0, 0, T_rel, np.full(6, 400.0))]

        monkeypatch.setattr(mm, "find_cross_edges", aliased_edges)
        res = mm.merge_maps(da_dir, db_dir, out_dir=None)
        assert len(res["cross_edges"]) == 0      # alias gated out
        b = res["builder"]
        na = res["n_a"]
        # B's nodes stay at their world placement (within the weak prior)
        for k in range(res["n_b"]):
            want_x = 4.0 + 2.0 * k
            got = b.node_pose(na + k)[:3, 3]
            assert abs(got[0] - want_x) < 0.3 and abs(got[1]) < 0.3, \
                (k, got)

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

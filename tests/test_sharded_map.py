"""Map-block sharded LIO (parallel/sharded_map.py): the surfel map is
hash-partitioned across an 8-device mesh; parity against the single-device
lio_step on the same scans."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from lsd_tpu.parallel.sharded_map import (make_sharded_lio_step, _owner_of,
                                          sharded_lio_init)
from lsd_tpu.sim import CircleSim, SimConfig
from lsd_tpu.slam import LioConfig, lio_init, lio_step

CAP = 4096
# research disabled: the sharded step fixes association once per scan
# (collectives inside a data-dependent cond are not SPMD-safe)
CFG = LioConfig(ds_capacity=2048, map_capacity=2 ** 14,
                scan_voxel=0.4, map_voxel=0.4, max_iters=4,
                research_thresh=0.0)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("dp",))


@pytest.fixture(scope="module")
def data():
    sim = CircleSim(SimConfig(n_scans=10, points_per_scan=CAP,
                              point_noise=0.01, seed=11,
                              rest_time=0.3, ramp_time=0.3))
    return sim.generate(capacity=CAP, imu_capacity=16)


def test_owner_partition_uniform():
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.integers(-500, 500, size=(20000, 3)),
                         jnp.int32)
    own = np.asarray(_owner_of(coords, 8))
    counts = np.bincount(own, minlength=8)
    assert own.min() >= 0 and own.max() < 8
    # uniform to within 20 %
    assert counts.min() > 0.8 * counts.mean()


def test_sharded_map_matches_single_device(mesh, data):
    step = make_sharded_lio_step(CFG, mesh)
    st_s = sharded_lio_init(CFG, mesh)
    st_1 = lio_init(CFG)
    poses_s, poses_1 = [], []
    for (P, S, M, I, IM, _T) in data:
        args = (jnp.asarray(P), jnp.asarray(S), jnp.asarray(M),
                jnp.asarray(I), jnp.asarray(IM))
        st_s, pose_s = step(st_s, *args)
        st_1, info_1 = lio_step(CFG, st_1, *args)
        poses_s.append(np.asarray(pose_s, float))
        poses_1.append(np.asarray(info_1["pose"], float))
    # exact parity is impossible (psum float-sum order; 8 local hash
    # tables allocate slightly differently than 1 global one), but the
    # sharded step must track the single-device step to millimetres and
    # ground truth equally well
    for ps, p1 in zip(poses_s, poses_1):
        assert np.linalg.norm(ps[:3, 3] - p1[:3, 3]) < 0.01
        assert np.abs(ps[:3, :3] - p1[:3, :3]).max() < 0.01
    gts = [d[5] for d in data]
    ate_s = np.sqrt(np.mean([np.linalg.norm(p[:3, 3] - g[:3, 3]) ** 2
                             for p, g in zip(poses_s, gts)]))
    ate_1 = np.sqrt(np.mean([np.linalg.norm(p[:3, 3] - g[:3, 3]) ** 2
                             for p, g in zip(poses_1, gts)]))
    assert ate_s < max(1.5 * ate_1, 0.02), (ate_s, ate_1)

    # the map really is distributed: every shard owns some voxels, none
    # owns them all
    keys = np.asarray(st_s.map.keys)
    ndev = 8
    per = keys.reshape(ndev, -1)
    occ = (per >= 0).sum(axis=1)
    assert (occ > 0).all()
    total = occ.sum()
    assert occ.max() < 0.5 * total


def test_sharded_map_capacity_scales(mesh, data):
    """Each device holds C/ndev slots: the map PyTree's per-device memory
    is 1/8 of the logical capacity."""
    st_s = sharded_lio_init(CFG, mesh)
    for arr in [st_s.map.keys, *st_s.map.coords, *st_s.map.moments]:
        assert arr.shape[0] == CFG.map_capacity
        shard_shapes = {s.data.shape for s in arr.addressable_shards}
        assert shard_shapes == {(CFG.map_capacity // 8,)}

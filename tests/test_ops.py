import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsd_tpu.ops import (voxel_downsample, voxelize_dynamic, hashmap_create,
                         hashmap_insert, hashmap_trim, hashmap_knn,
                         fit_planes, point_to_plane)


def cloud(n=1000, seed=0, scale=10.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32))


class TestVoxelDownsample:
    def test_dedup(self):
        # two clusters of identical points -> 2 output points
        pts = jnp.array([[0.1, 0.1, 0.1, 1.0]] * 5 + [[5.0, 5.0, 5.0, 2.0]] * 5)
        mask = jnp.ones(10, bool)
        out, omask = voxel_downsample(pts, mask, 0.5, capacity=16)
        assert int(omask.sum()) == 2
        vals = np.asarray(out[np.asarray(omask)])
        got = {tuple(round(float(x), 2) for x in v) for v in vals}
        assert got == {(0.1, 0.1, 0.1, 1.0), (5.0, 5.0, 5.0, 2.0)}

    def test_mask_respected(self):
        pts = jnp.concatenate([cloud(100), jnp.zeros((28, 3))], axis=0)
        mask = jnp.concatenate([jnp.ones(100, bool), jnp.zeros(28, bool)])
        out, omask = voxel_downsample(pts, mask, 0.01, capacity=256)
        assert int(omask.sum()) == 100  # tiny voxels: all kept, no padding leak

    def test_capacity_overflow(self):
        pts = cloud(500, seed=1)
        out, omask = voxel_downsample(pts, jnp.ones(500, bool), 0.01, capacity=64)
        assert int(omask.sum()) == 64

    def test_mean_pooling(self):
        pts = jnp.array([[0.0, 0.0, 0.0], [0.2, 0.2, 0.2]])
        out, omask = voxel_downsample(pts, jnp.ones(2, bool), 1.0, capacity=4)
        assert int(omask.sum()) == 1
        np.testing.assert_allclose(np.asarray(out[0]), [0.1, 0.1, 0.1], atol=1e-6)


class TestVoxelizeDynamic:
    def test_grouping(self):
        pts = jnp.array([
            [0.05, 0.05, 0.5, 1.0],
            [0.06, 0.06, 0.5, 2.0],   # same voxel
            [3.0, 3.0, 0.5, 3.0],     # different voxel
            [100.0, 0.0, 0.0, 4.0],   # out of range
        ])
        mask = jnp.ones(4, bool)
        voxels, coords, num, vmask = voxelize_dynamic(
            pts, mask, voxel_size=(0.1, 0.1, 1.0), pc_range=(-5, -5, 0, 5, 5, 1),
            max_voxels=16, max_points_per_voxel=4)
        assert int(vmask.sum()) == 2
        counts = sorted(np.asarray(num[np.asarray(vmask)]).tolist())
        assert counts == [1, 2]

    def test_max_points_clip(self):
        pts = jnp.tile(jnp.array([[0.05, 0.05, 0.5, 1.0]]), (10, 1))
        voxels, coords, num, vmask = voxelize_dynamic(
            pts, jnp.ones(10, bool), (0.1, 0.1, 1.0), (-5, -5, 0, 5, 5, 1),
            max_voxels=4, max_points_per_voxel=3)
        assert int(num[0]) == 3


class TestHashMap:
    def test_insert_and_knn(self):
        m = hashmap_create(capacity=2 ** 13, points_per_voxel=8, voxel_size=0.5)
        pts = cloud(2000, seed=2, scale=5.0)
        m = hashmap_insert(m, pts, jnp.ones(len(pts), bool))
        assert int((m.keys >= 0).sum()) > 100
        # query near inserted points: the nearest neighbor of an inserted
        # point should (almost always — bounded probing may drop a voxel
        # when its 8-slot window is full) be itself at distance 0
        q = pts[:64]
        nbrs, valid = hashmap_knn(m, q, jnp.ones(64, bool), k=5)
        assert bool(valid[:, 0].all())
        d0 = np.linalg.norm(np.asarray(nbrs[:, 0] - q), axis=-1)
        assert int((d0 < 1e-5).sum()) >= 62

    def test_knn_orders_by_distance(self):
        m = hashmap_create(capacity=2 ** 10, points_per_voxel=8, voxel_size=1.0)
        pts = jnp.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0], [0.5, 0.0, 0.0], [0.9, 0.0, 0.0]])
        m = hashmap_insert(m, pts, jnp.ones(4, bool))
        q = jnp.array([[0.0, 0.0, 0.0]])
        nbrs, valid = hashmap_knn(m, q, jnp.ones(1, bool), k=4)
        d = np.linalg.norm(np.asarray(nbrs[0]), axis=-1)
        assert np.all(np.diff(d[np.asarray(valid[0])]) >= -1e-6)

    def test_per_voxel_capacity(self):
        m = hashmap_create(capacity=2 ** 10, points_per_voxel=4, voxel_size=1.0)
        pts = jnp.asarray(np.random.default_rng(3).uniform(0.1, 0.9, (20, 3)).astype(np.float32))
        m = hashmap_insert(m, pts, jnp.ones(20, bool))
        assert int(m.counts.max()) == 4  # clipped to K

    def test_incremental_insert(self):
        m = hashmap_create(capacity=2 ** 10, points_per_voxel=8, voxel_size=1.0)
        a = jnp.array([[0.2, 0.2, 0.2]])
        b = jnp.array([[0.7, 0.7, 0.7]])  # same voxel, second call
        m = hashmap_insert(m, a, jnp.ones(1, bool))
        m = hashmap_insert(m, b, jnp.ones(1, bool))
        assert int(m.counts.max()) == 2
        assert int((m.keys >= 0).sum()) == 1

    def test_trim(self):
        m = hashmap_create(capacity=2 ** 12, points_per_voxel=8, voxel_size=0.5)
        pts = cloud(1000, seed=4, scale=20.0)
        m = hashmap_insert(m, pts, jnp.ones(len(pts), bool))
        before = int((m.keys >= 0).sum())
        m = hashmap_trim(m, jnp.zeros(3), radius=5.0)
        after = int((m.keys >= 0).sum())
        assert after < before
        vc = (np.asarray(m.coords[np.asarray(m.keys >= 0)]) + 0.5) * 0.5
        assert np.all(np.abs(vc) <= 5.0 + 1e-5)

    def test_masked_points_ignored(self):
        m = hashmap_create(capacity=2 ** 10, points_per_voxel=8, voxel_size=0.5)
        pts = cloud(100, seed=5)
        m = hashmap_insert(m, pts, jnp.zeros(100, bool))
        assert int((m.keys >= 0).sum()) == 0


class TestPlaneFit:
    def test_perfect_plane(self):
        rng = np.random.default_rng(6)
        # z = 2.0 plane
        nbrs = np.zeros((4, 5, 3), np.float32)
        nbrs[..., :2] = rng.uniform(-1, 1, (4, 5, 2))
        nbrs[..., 2] = 2.0
        normals, d, ok = fit_planes(jnp.asarray(nbrs), jnp.ones((4, 5), bool))
        assert bool(ok.all())
        n = np.asarray(normals)
        np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-4)
        # plane eq: n.p + d = 0 at z=2 -> d = -2*nz
        np.testing.assert_allclose(np.asarray(d), -2.0 * n[:, 2], atol=1e-3)

    def test_noisy_plane_rejected(self):
        rng = np.random.default_rng(7)
        nbrs = rng.uniform(-1, 1, (4, 5, 3)).astype(np.float32) * 3.0
        normals, d, ok = fit_planes(jnp.asarray(nbrs), jnp.ones((4, 5), bool), inlier_thresh=0.01)
        assert not bool(ok.any())

    def test_too_few_points(self):
        nbrs = jnp.zeros((2, 5, 3))
        valid = jnp.zeros((2, 5), bool).at[:, :2].set(True)
        _, _, ok = fit_planes(nbrs, valid)
        assert not bool(ok.any())

    def test_point_to_plane_sign(self):
        normals = jnp.array([[0.0, 0.0, 1.0]])
        d = jnp.array([-2.0])
        pts = jnp.array([[0.0, 0.0, 2.5]])
        r = point_to_plane(pts, normals, d)
        np.testing.assert_allclose(np.asarray(r), [0.5], atol=1e-6)

"""Guard: hot jitted functions must not capture device-array constants.

A module-level ``jnp.asarray([...])`` constant (or one created at trace time)
is embedded in the jaxpr as a concrete ``jax.Array``.  Unlike numpy constants
— which XLA inlines as literals into the compiled executable — captured
device arrays stay runtime arguments, and on tunneled TPU transports every
call then pays a host round-trip (~1 ms measured) AND permanently degrades
the session's async dispatch (measured 14.8 ms -> 0.13 ms per LIO step after
removing them).  This test walks the jaxpr of every hot entry point and
fails if any constant is a ``jax.Array``; use numpy for constants instead.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _captured_device_consts(fn, *args, **kwargs):
    jpr = jax.make_jaxpr(fn, **kwargs)(*args)
    return [c for c in jpr.consts if isinstance(c, jax.Array)]


def _assert_clean(fn, *args, **kwargs):
    consts = _captured_device_consts(fn, *args, **kwargs)
    assert not consts, (
        f"{fn} captures {len(consts)} device-array constant(s) "
        f"(shapes {[c.shape for c in consts]}); use np constants instead"
    )


class TestLioPath:
    def test_lio_step(self):
        from lsd_tpu.slam import LioConfig, lio_init, lio_step
        cfg = LioConfig(ds_capacity=64, map_capacity=256, map_points_per_voxel=4)
        st = lio_init(cfg)
        pts = jnp.zeros((128, 3))
        stamps = jnp.zeros((128,))
        mask = jnp.ones((128,), bool)
        imu = jnp.zeros((8, 7))
        imu_mask = jnp.ones((8,), bool)
        _assert_clean(lambda *a: lio_step(cfg, *a), st, pts, stamps, mask,
                      imu, imu_mask)

    def test_lio_step_points_map(self):
        from lsd_tpu.slam import LioConfig, lio_init, lio_step
        cfg = LioConfig(ds_capacity=64, map_capacity=256,
                        map_points_per_voxel=4, map_type="points")
        st = lio_init(cfg)
        _assert_clean(lambda *a: lio_step(cfg, *a), st, jnp.zeros((128, 3)),
                      jnp.zeros((128,)), jnp.ones((128,), bool),
                      jnp.zeros((8, 7)), jnp.ones((8,), bool))


class TestOps:
    def test_surfel(self):
        from lsd_tpu.ops.surfel import (surfel_create, surfel_insert,
                                        surfel_match, surfel_trim)
        m = surfel_create(256, 0.5)
        pts = jnp.zeros((64, 3))
        mask = jnp.ones((64,), bool)
        _assert_clean(surfel_insert, m, pts, mask)
        _assert_clean(lambda *a: surfel_match(*a, 0.1), m, pts, mask)
        _assert_clean(lambda mm: surfel_trim(mm, jnp.zeros(3), 10.0), m)

    def test_hashmap(self):
        from lsd_tpu.ops.hashmap import (hashmap_create, hashmap_insert,
                                         hashmap_knn, hashmap_trim)
        m = hashmap_create(256, 4, 0.5)
        pts = jnp.zeros((64, 3))
        mask = jnp.ones((64,), bool)
        _assert_clean(hashmap_insert, m, pts, mask)
        _assert_clean(lambda *a: hashmap_knn(*a, k=5, neighborhood=7), m, pts, mask)
        _assert_clean(lambda mm: hashmap_trim(mm, jnp.zeros(3), 10.0), m)

    def test_voxelize(self):
        from lsd_tpu.ops.voxelize import voxel_downsample, voxelize_dynamic
        pts = jnp.zeros((128, 4))
        mask = jnp.ones((128,), bool)
        _assert_clean(lambda p, m: voxel_downsample(p, m, 0.5, 64), pts, mask)
        _assert_clean(
            lambda p, m: voxelize_dynamic(p, m, (0.2, 0.2, 0.2),
                                          (-10, -10, -3, 10, 10, 3), 32, 8),
            pts, mask)


class TestGeometry:
    def test_se3_so3(self):
        from lsd_tpu.geometry import se3, so3
        R = jnp.eye(3)
        t = jnp.zeros(3)
        q = jnp.asarray([1.0, 0, 0, 0])
        _assert_clean(se3.make_pose, R, t)
        _assert_clean(se3.inverse, jnp.eye(4))
        _assert_clean(se3.log_se3, jnp.eye(4))
        _assert_clean(so3.quat_conj, q)
        _assert_clean(so3.quat_to_matrix, q)
        _assert_clean(so3.matrix_to_quat, R)

    def test_imu(self):
        from lsd_tpu.slam.imu import ImuNoise, propagate, undistort
        from lsd_tpu.slam.state import init_state
        st = init_state()
        P = jnp.eye(24)
        imu = jnp.zeros((8, 7))
        imu_mask = jnp.ones((8,), bool)
        _assert_clean(lambda *a: propagate(*a, ImuNoise(), 9.81), st, P, imu, imu_mask)


class TestGraph:
    def test_pgo_optimize(self):
        from lsd_tpu.slam.graph_builder import PoseGraphBuilder
        from lsd_tpu.slam.posegraph import PgoConfig, optimize
        b = PoseGraphBuilder()
        T = np.eye(4, dtype=np.float32)
        b.add_node(T, fixed=True)
        rel = np.eye(4, dtype=np.float32)
        rel[0, 3] = 1.0
        for k in range(3):
            T = T @ rel
            b.add_node(T)
            b.add_se3_edge(k, k + 1, rel)
        b.add_gps_prior(1, T[:3, 3])
        g = b.to_data()
        cfg = PgoConfig(outer_iters=1, cg_iters=3)
        _assert_clean(lambda gg: optimize(gg, cfg)[0].nodes.pos, g)

    def test_ukf(self):
        from lsd_tpu.slam.ukf import UkfConfig, ukf_init, ukf_predict, ukf_correct
        cfg = UkfConfig()
        st = ukf_init()
        dt = jnp.asarray(0.1)
        gyro = jnp.zeros(3)
        acc = jnp.zeros(3)
        _assert_clean(lambda s, d, g, a: ukf_predict(s, d, cfg, g, a),
                      st, dt, gyro, acc)
        _assert_clean(lambda s, p, q: ukf_correct(s, p, q, cfg), st,
                      jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]))


class TestRegistrationAndSharded:
    def test_registration(self):
        from lsd_tpu.ops.hashmap import hashmap_create, hashmap_insert
        from lsd_tpu.slam.registration import (icp_point_to_plane, ndt_align,
                                               ndt_build)
        pts = jnp.zeros((128, 3))
        mask = jnp.ones((128,), bool)
        q0 = jnp.asarray([1.0, 0, 0, 0])
        t0 = jnp.zeros(3)
        m = ndt_build(pts, mask, 1.0, 256)
        _assert_clean(lambda p, ms: ndt_build(p, ms, 1.0, 256), pts, mask)
        _assert_clean(lambda mm, p, ms, q, t: ndt_align(mm, p, ms, q, t),
                      m, pts, mask, q0, t0)
        hm = hashmap_insert(hashmap_create(256, 8, 0.5), pts, mask)
        _assert_clean(lambda mm, p, ms, q, t: icp_point_to_plane(mm, p, ms, q, t),
                      hm, pts, mask, q0, t0)

    def test_scancontext(self):
        from lsd_tpu.slam.scancontext import (make_descriptor, sc_db_add,
                                              sc_db_create, sc_query)
        pts = jnp.zeros((128, 3))
        mask = jnp.ones((128,), bool)
        _assert_clean(make_descriptor, pts, mask)
        db = sc_db_add(sc_db_create(64), make_descriptor(pts, mask))
        _assert_clean(lambda d, q: sc_query(d, q), db,
                      make_descriptor(pts, mask))

    def test_sharded_pgo(self):
        from jax.sharding import Mesh
        from lsd_tpu.parallel.sharded_pgo import optimize_sharded
        from lsd_tpu.slam.graph_builder import PoseGraphBuilder
        from lsd_tpu.slam.posegraph import PgoConfig
        b = PoseGraphBuilder()
        T = np.eye(4, dtype=np.float32)
        b.add_node(T, fixed=True)
        rel = np.eye(4, dtype=np.float32)
        rel[0, 3] = 1.0
        for k in range(7):
            T = T @ rel
            b.add_node(T)
            b.add_se3_edge(k, k + 1, rel)
        g = b.to_data()
        mesh = Mesh(np.asarray(jax.devices()), ("d",))
        cfg = PgoConfig(outer_iters=1, cg_iters=3)
        _assert_clean(
            lambda gg: optimize_sharded(gg, mesh, cfg)[0].pos, g)

    def test_detector(self):
        from lsd_tpu.models.detector import CenterPointDetector, DetectorConfig
        cfg = DetectorConfig()
        model = CenterPointDetector(cfg)
        pts = jnp.zeros((512, 4))
        mask = jnp.ones((512,), bool)
        params = model.init(jax.random.PRNGKey(0), pts, mask)
        _assert_clean(lambda pr, x, mm: model.apply(pr, x, mm),
                      params, pts, mask)

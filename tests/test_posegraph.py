import numpy as np
import jax.numpy as jnp
import pytest

from lsd_tpu.geometry import se3, so3
from lsd_tpu.slam.graph_builder import PoseGraphBuilder
from lsd_tpu.slam.posegraph import PgoConfig, optimize


def make_T(yaw=0.0, x=0.0, y=0.0, z=0.0):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(so3.exp_so3(jnp.asarray([0.0, 0.0, yaw])))
    T[:3, 3] = (x, y, z)
    return T


def circle_graph(n=40, radius=10.0, drift=0.002, seed=0):
    """Odometry chain around a circle with systematic yaw drift."""
    rng = np.random.default_rng(seed)
    b = PoseGraphBuilder()
    gt = []
    dth = 2 * np.pi / n
    for k in range(n + 1):
        th = k * dth
        gt.append(make_T(yaw=th + np.pi / 2, x=radius * np.cos(th), y=radius * np.sin(th)))
    # integrate noisy odometry to get initial estimates
    est = [gt[0]]
    odo = []
    for k in range(n):
        T_rel = np.linalg.inv(gt[k]) @ gt[k + 1]
        T_noisy = T_rel.copy()
        T_noisy[:3, :3] = T_noisy[:3, :3] @ np.asarray(
            so3.exp_so3(jnp.asarray([0.0, 0.0, drift + rng.normal(0, 1e-4)])))
        odo.append(T_rel)  # measurements are the TRUE relatives
        est.append(est[-1] @ T_noisy)
    b.add_node(est[0], fixed=True)
    for k in range(n):
        b.add_node(est[k + 1])
        b.add_se3_edge(k, k + 1, odo[k], rot_info=400.0, trans_info=400.0)
    return b, gt


class TestPGO:
    def test_odometry_chain_with_loop_closure(self):
        b, gt = circle_graph()
        n = b.num_nodes
        # before optimization the end node has drifted
        err0 = np.linalg.norm(b.node_pose(n - 1)[:3, 3] - gt[-1][:3, 3])
        assert err0 > 0.5
        # loop closure: relative pose between first and last node (identical
        # position, full turn)
        T_rel = np.linalg.inv(gt[0]) @ gt[-1]
        b.add_se3_edge(0, n - 1, T_rel, rot_info=400.0, trans_info=400.0)
        g, info = optimize(b.to_data(), PgoConfig(outer_iters=8, cg_iters=80))
        b.update_from(g)
        errs = [np.linalg.norm(b.node_pose(k)[:3, 3] - gt[k][:3, 3]) for k in range(n)]
        assert max(errs) < 0.15, f"max err {max(errs):.3f}"
        # costs must decrease
        costs = np.asarray(info["costs"])
        assert costs[-1] < costs[0]

    def test_fixed_node_stays(self):
        b, gt = circle_graph(n=10)
        b.add_se3_edge(0, b.num_nodes - 1, np.linalg.inv(gt[0]) @ gt[-1])
        p0 = b.node_pose(0)
        g, _ = optimize(b.to_data())
        b.update_from(g)
        np.testing.assert_allclose(b.node_pose(0), p0, atol=1e-6)

    def test_gps_priors_pull_graph(self):
        b, gt = circle_graph(n=20, drift=0.004)
        n = b.num_nodes
        for k in range(0, n, 2):
            b.add_gps_prior(k, gt[k][:3, 3], info=10.0)
        g, info = optimize(b.to_data(), PgoConfig(outer_iters=8, cg_iters=80))
        b.update_from(g)
        errs = [np.linalg.norm(b.node_pose(k)[:3, 3] - gt[k][:3, 3]) for k in range(n)]
        assert max(errs) < 0.2, f"max err {max(errs):.3f}"

    def test_gps_outlier_gated(self):
        b, gt = circle_graph(n=20, drift=0.0)
        n = b.num_nodes
        for k in range(0, n, 2):
            b.add_gps_prior(k, gt[k][:3, 3], info=10.0)
        # gross outlier at node 10: 50 m off
        b.add_gps_prior(10, gt[10][:3, 3] + np.asarray([50.0, 0, 0]), info=10.0)
        g, info = optimize(b.to_data(), PgoConfig(outer_iters=8, cg_iters=80))
        b.update_from(g)
        err10 = np.linalg.norm(b.node_pose(10)[:3, 3] - gt[10][:3, 3])
        assert err10 < 0.3, f"outlier bent the graph: {err10:.3f}"
        assert int(info["gps_inliers"]) <= 11  # the outlier prior got gated

    def test_floor_prior_flattens_z(self):
        b = PoseGraphBuilder()
        # chain that drifts upward; floor says z=0
        T = np.eye(4, dtype=np.float32)
        b.add_node(T, fixed=True)
        rel = make_T(x=1.0, z=0.05)
        for k in range(10):
            T = T @ rel
            b.add_node(T)
            b.add_se3_edge(k, k + 1, rel, rot_info=100.0, trans_info=1.0)
            b.add_floor_prior(k + 1, 0.0, z_info=100.0, tilt_info=1.0)
        g, _ = optimize(b.to_data(), PgoConfig(outer_iters=6, cg_iters=60))
        b.update_from(g)
        zs = [abs(b.node_pose(k)[2, 3]) for k in range(1, 11)]
        assert max(zs) < 0.05, f"z not flattened: {zs}"

    def test_orientation_prior(self):
        b = PoseGraphBuilder()
        b.add_node(np.eye(4, dtype=np.float32), fixed=True)
        # second node rotated 0.2 rad in yaw, orientation prior says identity
        b.add_node(make_T(yaw=0.2, x=1.0))
        b.add_se3_edge(0, 1, make_T(yaw=0.2, x=1.0), rot_info=1.0, trans_info=100.0)
        b.add_orientation_prior(1, np.eye(4, dtype=np.float32), info=1000.0)
        g, _ = optimize(b.to_data())
        b.update_from(g)
        yaw = np.asarray(so3.matrix_to_rpy(jnp.asarray(b.node_pose(1)[:3, :3])))[2]
        assert abs(yaw) < 0.02

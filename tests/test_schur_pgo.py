"""Schur-complement distributed PGO (parallel/schur_pgo.py): parity with
the single-device robust-GN solver on graphs exercising ALL factor types
(SE3 odometry + loops, GPS w/ chi2 gating, floor, orientation)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from lsd_tpu.parallel.schur_pgo import build_plan, optimize_schur
from lsd_tpu.slam.graph_builder import PoseGraphBuilder
from lsd_tpu.slam.posegraph import PgoConfig, optimize


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("dp",))


def _pose(x, y, yaw=0.0):
    T = np.eye(4, dtype=np.float32)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:2, :2] = [[c, -s], [s, c]]
    T[0, 3], T[1, 3] = x, y
    return T


def _loop_graph(n=96, drift=0.02, with_priors=True, with_outlier=False):
    b = PoseGraphBuilder()
    rng = np.random.default_rng(0)
    b.add_node(_pose(0, 0), fixed=True)
    for k in range(1, n):
        b.add_node(_pose(2.0 * k, drift * k))
        T_rel = np.eye(4, dtype=np.float32)
        T_rel[0, 3], T_rel[1, 3] = 2.0, drift
        b.add_se3_edge(k - 1, k, T_rel, rot_info=400.0, trans_info=400.0)
    # loop edges carrying the true (drift-free) relative transforms
    for (i, j) in [(0, n - 1), (5, n - 20), (10, n // 2)]:
        T_rel = np.eye(4, dtype=np.float32)
        T_rel[0, 3] = 2.0 * (j - i)
        b.add_se3_edge(i, j, T_rel, rot_info=400.0, trans_info=400.0)
    if with_priors:
        for k in range(4, n, 12):
            b.add_gps_prior(k, np.array([2.0 * k, 0.0, 0.0], np.float32)
                            + rng.normal(0, 0.02, 3).astype(np.float32),
                            info=4.0)
            b.add_floor_prior(k, 0.0, z_info=4.0, tilt_info=4.0)
            b.add_orientation_prior(k, np.array([1.0, 0, 0, 0], np.float32),
                                    info=4.0)
    if with_outlier:
        b.add_gps_prior(n // 3, np.array([999.0, 999.0, 0.0], np.float32),
                        info=4.0)
    return b


def test_plan_partitions_edges(mesh):
    g = _loop_graph().to_data()
    plan = build_plan(g, 8)
    # every real edge assigned exactly once
    emask = np.asarray(g.se3.mask)
    assigned = plan.e_rows[plan.e_mask]
    assert sorted(assigned.tolist()) == np.flatnonzero(emask).tolist()
    # separators: 3 loop edges -> <= 6 endpoints (+cross-chunk odometry)
    assert plan.sep_mask.sum() >= 6
    # interiors + separators cover all nodes exactly once
    ids = np.concatenate([plan.int_ids[plan.int_mask],
                          plan.sep_ids[plan.sep_mask]])
    assert sorted(ids.tolist()) == np.flatnonzero(
        np.asarray(g.nodes.mask)).tolist()


def test_schur_matches_single_device(mesh):
    g = _loop_graph().to_data()
    cfg = PgoConfig(outer_iters=6, cg_iters=120)
    ref, _ = optimize(g, cfg)
    out, info = optimize_schur(g, mesh, cfg)
    np.testing.assert_allclose(np.asarray(out.nodes.pos),
                               np.asarray(ref.nodes.pos), atol=5e-3)
    dq = np.abs(np.asarray(out.nodes.quat)) - np.abs(np.asarray(ref.nodes.quat))
    assert np.abs(dq).max() < 5e-3
    assert info["n_sep"] >= 6


def test_schur_snaps_drift(mesh):
    g = _loop_graph(drift=0.05, with_priors=False).to_data()
    y_before = float(g.nodes.pos[95, 1])
    out, _ = optimize_schur(g, mesh, PgoConfig(outer_iters=6))
    y_after = float(out.nodes.pos[95, 1])
    assert abs(y_after) < 0.1 < abs(y_before)


def test_schur_gates_gps_outlier(mesh):
    g = _loop_graph(with_outlier=True).to_data()
    n_priors = int(np.asarray(g.gps.mask).sum())
    out, info = optimize_schur(g, mesh, PgoConfig(outer_iters=6))
    # the 999,999 outlier prior is gated off and the graph is not bent
    assert int(info["gps_inliers"]) == n_priors - 1
    assert abs(float(out.nodes.pos[32, 1])) < 1.0

import numpy as np
import pytest

from lsd_tpu.parallel import make_mesh, optimize_sharded
from lsd_tpu.slam.posegraph import PgoConfig, optimize
from tests.test_posegraph import circle_graph

# shared capacities + config so both tests reuse one compiled kernel
CAPS = dict(node_cap=64, se3_cap=64, gps_cap=16)
CFG = PgoConfig(outer_iters=6, cg_iters=40)


class TestShardedPgo:
    def test_matches_single_device(self):
        b, gt = circle_graph(n=40)
        n = b.num_nodes
        T_rel = np.linalg.inv(gt[0]) @ gt[-1]
        b.add_se3_edge(0, n - 1, T_rel, rot_info=400.0, trans_info=400.0)
        data = b.to_data(**CAPS)

        g_single, _ = optimize(data, CFG)
        mesh = make_mesh()
        g_shard = optimize_sharded(data, mesh, CFG)

        ps = np.asarray(g_single.nodes.pos)[:n]
        pm = np.asarray(g_shard.nodes.pos)[:n]
        # the sharded solver must agree with the single-device one...
        np.testing.assert_allclose(pm, ps, atol=1e-3)
        # ...and both converge toward the ground-truth circle (6 GN rounds
        # of 40 CG iters: partial convergence, tighter with more budget)
        errs = [np.linalg.norm(pm[k] - gt[k][:3, 3]) for k in range(n)]
        assert max(errs) < 0.4, f"sharded max err {max(errs):.3f}"

    def test_gps_outlier_gated_sharded(self):
        b, gt = circle_graph(n=20, drift=0.0)
        n = b.num_nodes
        for k in range(0, n, 2):
            b.add_gps_prior(k, gt[k][:3, 3], info=10.0)
        b.add_gps_prior(10, gt[10][:3, 3] + np.asarray([50.0, 0, 0]), info=10.0)
        mesh = make_mesh()
        g = optimize_sharded(b.to_data(**CAPS), mesh, CFG)
        b.update_from(g)
        err10 = np.linalg.norm(b.node_pose(10)[:3, 3] - gt[10][:3, 3])
        assert err10 < 0.3, f"outlier bent the sharded graph: {err10:.3f}"

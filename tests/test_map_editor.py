import numpy as np
import jax.numpy as jnp
import pytest

from lsd_tpu.runtime import clear_interfaces
from lsd_tpu.runtime.config import ConfigManager
from lsd_tpu.runtime.interface import call_interface
from lsd_tpu.runtime.modules import SlamModule
from lsd_tpu.sim import CircleSim, SimConfig
from lsd_tpu.io.frame import Frame  # noqa: F401


@pytest.fixture
def slam_module():
    clear_interfaces()
    cfg = ConfigManager().config
    m = SlamModule(cfg)
    m.setup(cfg)
    yield m
    clear_interfaces()


def feed_scans(m, n=25):
    sim = CircleSim(SimConfig(radius=8.0, omega=0.8, n_scans=n,
                              points_per_scan=4096, seed=44))
    data = sim.generate(capacity=4096, imu_capacity=16)
    from lsd_tpu.slam.state import init_state
    from lsd_tpu.geometry import so3
    R, p = sim.pose(0.0)
    m.engine.lio_state = m.engine.lio_state._replace(
        nav=init_state()._replace(
            pos=jnp.asarray(p, jnp.float32),
            quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
            vel=jnp.asarray(sim.velocity(0.0), jnp.float32)))
    for k, (P_, S_, M_, I_, IM_, _) in enumerate(data):
        m.engine.process_scan(P_, S_, M_, I_, IM_, stamp_us=int(k * 1e5))


@pytest.mark.slow
class TestMapEditor:
    def test_graph_meta_and_crud(self, slam_module):
        feed_scans(slam_module)
        meta = call_interface("slam.get_graph_meta")
        n = len(meta["vertices"])
        assert n >= 5
        assert len(meta["edges"]) >= n - 1
        assert meta["vertices"][0]["fix"] is True

        kf = call_interface("slam.get_key_frame", 1)
        assert kf["id"] == 1 and len(kf["points"]) > 100

        # manual loop closure edge + optimize (editor flow)
        T_rel = np.linalg.inv(np.asarray(meta["vertices"][0]["pose"])) @ \
            np.asarray(meta["vertices"][n - 1]["pose"])
        call_interface("slam.add_edge", 0, n - 1, T_rel)
        meta2 = call_interface("slam.get_graph_meta")
        assert len(meta2["edges"]) == len(meta["edges"]) + 1
        call_interface("slam.graph_optimize")

        call_interface("slam.set_vertex_fix", 1, True)
        assert call_interface("slam.get_graph_meta")["vertices"][1]["fix"]

        call_interface("slam.del_edge", len(meta2["edges"]) - 1)
        assert len(call_interface("slam.get_graph_meta")["edges"]) == len(meta["edges"])

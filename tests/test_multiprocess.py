"""True multi-process (multi-host-style) validation.

Spawns real worker processes, each with its own JAX runtime and 2
virtual CPU devices, connected through jax.distributed (Gloo
collectives) — the same code path a TPU pod slice uses over DCN. The
distributed pose-graph solver must produce the single-device solver's
answer exactly across the 2-process x 2-device global mesh.
(SURVEY.md 2.5 / BASELINE.json north star: multi-host scale-out.)
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(f"127.0.0.1:{port}", n, pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from lsd_tpu.slam.graph_builder import PoseGraphBuilder
from lsd_tpu.slam.posegraph import PgoConfig, optimize
from lsd_tpu.parallel.sharded_pgo import optimize_sharded
from jax.sharding import Mesh
from jax.experimental import multihost_utils

assert jax.device_count() == 2 * n, jax.device_count()

rng = np.random.default_rng(0)
b = PoseGraphBuilder()
T = np.eye(4); poses = []
for i in range(16):
    b.add_node(T.copy(), fixed=(i == 0))
    poses.append(T.copy())
    d = np.eye(4); d[0, 3] = 1.0
    T = T @ d
for i in range(15):
    rel = np.linalg.inv(poses[i]) @ poses[i + 1]
    rel[0, 3] += rng.normal(0, 0.05)
    b.add_se3_edge(i, i + 1, rel)
b.add_se3_edge(0, 15, np.linalg.inv(poses[0]) @ poses[15])
data = b.to_data()
cfg = PgoConfig(outer_iters=5, cg_iters=30)
ref, _ = optimize(data, cfg)                      # process-local reference
data_np = jax.tree.map(np.asarray, data)          # process-replicated inputs
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dp",))
out = optimize_sharded(jax.tree.map(jnp.asarray, data_np), mesh, cfg)
pos = multihost_utils.process_allgather(out.nodes.pos, tiled=True)
err = float(np.max(np.abs(np.asarray(jax.device_get(ref.nodes.pos)) -
                          np.asarray(pos))))
assert err < 1e-6, err
print(f"WORKER_{pid}_OK err={err}", flush=True)
"""


LIO_WORKER = r"""
import sys, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(f"127.0.0.1:{port}", n, pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from jax.sharding import Mesh
from lsd_tpu.parallel import sharded_lio_update
from lsd_tpu.sim import CircleSim, SimConfig
from lsd_tpu.slam import LioConfig, lio_init, lio_step
from lsd_tpu.slam.imu import propagate, undistort
from lsd_tpu.slam.state import init_state
from lsd_tpu.ops import voxel_downsample
from lsd_tpu.geometry import so3

sim = CircleSim(SimConfig(n_scans=2, points_per_scan=4096, seed=3))
data = sim.generate(capacity=4096, imu_capacity=16)
R, p = sim.pose(0.0)
nav0 = init_state()._replace(pos=jnp.asarray(p, jnp.float32),
                             quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
                             vel=jnp.asarray(sim.velocity(0.0), jnp.float32))
cfg = LioConfig(ds_capacity=2048, map_capacity=2 ** 14,
                scan_voxel=0.4, map_voxel=0.4)
st = lio_init(cfg, nav0)
P_, S_, M_, I_, IM_, T = data[0]
st, _ = lio_step(cfg, st, jnp.asarray(P_), jnp.asarray(S_), jnp.asarray(M_),
                 jnp.asarray(I_), jnp.asarray(IM_))
P_, S_, M_, I_, IM_, T = data[1]
nav_prop, P_prop, track = propagate(st.nav, st.P, jnp.asarray(I_),
                                    jnp.asarray(IM_), cfg.imu_noise,
                                    cfg.acc_scale)
und = undistort(jnp.asarray(P_)[:, :3], jnp.asarray(S_), jnp.asarray(M_),
                nav_prop, track)
ds_pts, ds_mask = voxel_downsample(und, jnp.asarray(M_), cfg.scan_voxel,
                                   cfg.ds_capacity)
# single-device reference first (purely local)
st2, _ = lio_step(cfg, st, jnp.asarray(P_), jnp.asarray(S_), jnp.asarray(M_),
                  jnp.asarray(I_), jnp.asarray(IM_))
ref_pos = np.asarray(jax.device_get(st2.nav.pos))
# now the global-mesh sharded update (inputs via process-replicated numpy)
np_ify = lambda t: jax.tree.map(lambda a: np.asarray(jax.device_get(a)), t)
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dp",))
nav_sharded = sharded_lio_update(
    cfg, mesh, jax.tree.map(jnp.asarray, np_ify(nav_prop)),
    jnp.asarray(np.asarray(jax.device_get(P_prop))),
    jax.tree.map(jnp.asarray, np_ify(st.map)),
    jnp.asarray(np.asarray(jax.device_get(ds_pts[:, :3]))),
    jnp.asarray(np.asarray(jax.device_get(ds_mask))))
from jax.experimental import multihost_utils
pos = multihost_utils.process_allgather(nav_sharded.pos, tiled=True)
err = float(np.linalg.norm(np.asarray(pos).reshape(-1)[:3] - ref_pos))
assert err < 5e-3, err
print(f"WORKER_{pid}_OK err={err}", flush=True)
"""


SCHUR_WORKER = r"""
import sys, os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(f"127.0.0.1:{port}", n, pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from lsd_tpu.slam.graph_builder import PoseGraphBuilder
from lsd_tpu.slam.posegraph import PgoConfig, optimize
from lsd_tpu.parallel.schur_pgo import optimize_schur
from jax.sharding import Mesh
from jax.experimental import multihost_utils

rng = np.random.default_rng(0)
b = PoseGraphBuilder()
T = np.eye(4, dtype=np.float32); poses = []
for i in range(48):
    b.add_node(T.copy(), fixed=(i == 0))
    poses.append(T.copy())
    d = np.eye(4, dtype=np.float32); d[0, 3] = 1.0; d[1, 3] = 0.02
    T = T @ d
for i in range(47):
    rel = (np.linalg.inv(poses[i]) @ poses[i + 1]).astype(np.float32)
    b.add_se3_edge(i, i + 1, rel)
loop = np.eye(4, dtype=np.float32); loop[0, 3] = 47.0
b.add_se3_edge(0, 47, loop)
for k in range(4, 48, 9):
    b.add_gps_prior(k, poses[k][:3, 3] + rng.normal(0, 0.02, 3).astype(np.float32), info=4.0)
    b.add_floor_prior(k, 0.0, z_info=4.0, tilt_info=4.0)
    b.add_orientation_prior(k, np.array([1.0, 0, 0, 0], np.float32), info=4.0)
data = b.to_data()
cfg = PgoConfig(outer_iters=5, cg_iters=120)
ref, _ = optimize(data, cfg)                      # process-local reference
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("dp",))
out, info = optimize_schur(jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), data), mesh, cfg)
pos = multihost_utils.process_allgather(out.nodes.pos, tiled=True)
pos = np.asarray(pos).reshape(-1, 3)[:ref.nodes.pos.shape[0]]
err = float(np.max(np.abs(np.asarray(jax.device_get(ref.nodes.pos)) - pos)))
assert err < 5e-3, err
print(f"WORKER_{pid}_OK err={err}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, worker_src: str, n: int = 2):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(worker_src % {"repo": repo})
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(p), str(n),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for p in range(n)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_{pid}_OK" in out, out[-2000:]


@pytest.mark.slow
def test_distributed_pgo_across_processes(tmp_path):
    _run_workers(tmp_path, WORKER)


@pytest.mark.slow
def test_sharded_lio_across_processes(tmp_path):
    _run_workers(tmp_path, LIO_WORKER)


@pytest.mark.slow
def test_schur_pgo_across_processes(tmp_path):
    """Schur-complement PGO (all factor types) across 2 real processes x 2
    devices must match the single-device robust-GN solver."""
    _run_workers(tmp_path, SCHUR_WORKER)

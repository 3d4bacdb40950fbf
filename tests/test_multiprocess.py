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


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_distributed_pgo_across_processes(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": repo})
    port = _free_port()
    n = 2
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

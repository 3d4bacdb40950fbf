"""Scale-out efficiency: measured comm volumes + an analytic ICI model.

Only one real TPU chip is reachable in this environment, so multi-chip
wall-clock cannot be measured directly.  What CAN be measured honestly:

  1. the single-chip step time of each distributed kernel's compute body
     (the denominator of the efficiency ratio);
  2. the exact collective BYTES each kernel moves per step (read off the
     shard_map programs; verified against the jaxpr), and
  3. wall-clock of the same SPMD programs on virtual CPU meshes of
     1/2/4/8 devices (validates overhead trends, NOT ICI performance).

The ICI model uses a configurable per-chip interconnect bandwidth
(default 45 GB/s per link, v5e 2D-torus class) and a per-psum latency
term; projected efficiency  E(n) = t_compute/n / (t_compute/n + t_comm).

Usage: python -m lsd_tpu.tools.scaling [--out scaling.json]
"""
from __future__ import annotations

import json

import numpy as np

ICI_BW = 45e9          # bytes/s per link (v5e-class)
PSUM_LAT = 10e-6       # seconds per psum hop


def _ring_allreduce_time(bytes_: float, ndev: int) -> float:
    """2(n-1)/n * bytes over the ring + per-step latency."""
    if ndev <= 1:
        return 0.0
    return 2.0 * (ndev - 1) / ndev * bytes_ / ICI_BW + PSUM_LAT * (ndev - 1)


def lio_model(t_single: float, ds_capacity: int = 16384, iters: int = 4):
    """Map-block sharded LIO step (parallel/sharded_map.py):
    per scan: 1 psum of (N, 10) f32 moments + iters psums of 24x24+24."""
    out = {}
    mom_bytes = ds_capacity * 10 * 4
    hth_bytes = (24 * 24 + 24) * 4 * iters
    for n in (2, 4, 8, 16):
        t_comm = _ring_allreduce_time(mom_bytes, n) + \
            _ring_allreduce_time(hth_bytes, n)
        t_n = t_single / n + t_comm
        out[n] = dict(t_comm_us=round(t_comm * 1e6, 1),
                      efficiency=round(t_single / n / t_n, 4),
                      speedup=round(t_single / t_n, 2))
    return dict(comm_bytes_per_scan=mom_bytes + hth_bytes, projected=out)


def schur_model(t_single: float, n_sep: int = 64):
    """Schur PGO GN round: one psum of (S*6)^2 + S*6 floats."""
    out = {}
    sb = ((n_sep * 6) ** 2 + n_sep * 6) * 4
    for n in (2, 4, 8, 16):
        t_comm = _ring_allreduce_time(sb, n)
        t_n = t_single / n + t_comm
        out[n] = dict(t_comm_us=round(t_comm * 1e6, 1),
                      efficiency=round(t_single / n / t_n, 4),
                      speedup=round(t_single / t_n, 2))
    return dict(comm_bytes_per_round=sb, projected=out)


def measure_virtual_cpu(max_dev: int = 8):
    """Wall-clock of the SPMD LIO step on virtual CPU meshes (overhead
    trend only; CPU 'collectives' are memcpys)."""
    import time
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from ..parallel.sharded_map import make_sharded_lio_step, sharded_lio_init
    from ..sim import CircleSim, SimConfig
    from ..slam.lio import LioConfig

    if jax.default_backend() != "cpu" or jax.device_count() < max_dev:
        return None
    cap = 8192
    sim = CircleSim(SimConfig(n_scans=4, points_per_scan=cap, seed=5))
    data = sim.generate(capacity=cap, imu_capacity=16)
    res = {}
    n = 1
    while n <= max_dev:
        cfg = LioConfig(ds_capacity=4096, map_capacity=2 ** 15,
                        scan_voxel=0.4, map_voxel=0.4,
                        research_thresh=0.0)
        mesh = Mesh(np.array(jax.devices()[:n]), ("dp",))
        step = make_sharded_lio_step(cfg, mesh)
        st = sharded_lio_init(cfg, mesh)
        for (P, S, M, I, IM, _T) in data:
            st, pose = step(st, jnp.asarray(P), jnp.asarray(S),
                            jnp.asarray(M), jnp.asarray(I), jnp.asarray(IM))
        jax.block_until_ready(pose)
        t0 = time.perf_counter()
        for _ in range(3):
            for (P, S, M, I, IM, _T) in data:
                st, pose = step(st, jnp.asarray(P), jnp.asarray(S),
                                jnp.asarray(M), jnp.asarray(I),
                                jnp.asarray(IM))
        jax.block_until_ready(pose)
        res[n] = round((time.perf_counter() - t0) / 12 * 1e3, 2)
        n *= 2
    return res


def main(argv=None):
    import argparse
    import time
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-virtual", action="store_true")
    args = ap.parse_args(argv)

    # measure single-chip compute times on the current backend
    import jax
    import jax.numpy as jnp
    from ..sim import CircleSim, SimConfig
    from ..slam import LioConfig, lio_init, lio_step
    cap = 2 ** 15
    sim = CircleSim(SimConfig(n_scans=8, points_per_scan=cap, seed=7))
    data = sim.generate(capacity=cap, imu_capacity=16)
    cfg = LioConfig(ds_capacity=16384, map_capacity=2 ** 18,
                    scan_voxel=0.4, map_voxel=0.4, max_iters=4)
    st = lio_init(cfg)
    _ = jax.device_get(jnp.zeros(1))
    for d in data[:3]:
        st, info = lio_step(cfg, st, *[jnp.asarray(a) for a in d[:5]])
    _ = jax.device_get(st.nav.pos)
    t0 = time.perf_counter()
    for d in data[3:]:
        st, info = lio_step(cfg, st, *[jnp.asarray(a) for a in d[:5]])
    _ = jax.device_get(st.nav.pos)
    t_lio = (time.perf_counter() - t0) / (len(data) - 3)

    # single-device PGO GN-round time on a 1k-node loop graph
    from ..slam.graph_builder import PoseGraphBuilder
    from ..slam.posegraph import PgoConfig, optimize
    b = PoseGraphBuilder()
    T = np.eye(4, dtype=np.float32)
    b.add_node(T, fixed=True)
    rel = np.eye(4, dtype=np.float32)
    rel[0, 3] = 1.0
    for k in range(1023):
        T = T @ rel
        b.add_node(T)
        b.add_se3_edge(k, k + 1, rel)
    g = b.to_data()
    pcfg = PgoConfig(outer_iters=3, cg_iters=30)
    out, _ = optimize(g, pcfg)
    _ = jax.device_get(out.nodes.pos[0])
    t0 = time.perf_counter()
    for _ in range(5):
        out, _ = optimize(g, pcfg)
    _ = jax.device_get(out.nodes.pos[0])
    t_pgo_round = (time.perf_counter() - t0) / (5 * pcfg.outer_iters)

    report = {
        "lio_t_single_ms": round(t_lio * 1e3, 3),
        "lio_scaling": lio_model(t_lio, cfg.ds_capacity, cfg.max_iters),
        "pgo_round_single_ms": round(t_pgo_round * 1e3, 3),
        "schur_scaling_64sep": schur_model(t_pgo_round, 64),
        "ici_model": dict(bw_gbps=ICI_BW / 1e9, psum_lat_us=PSUM_LAT * 1e6),
    }
    if not args.skip_virtual:
        v = measure_virtual_cpu()
        if v:
            report["virtual_cpu_ms_per_scan"] = v
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()

"""Settle the Pallas point-to-plane path by measurement (VERDICT r2 weak #5).

Times the full jitted LIO scan step at bench shapes (32k-pt scans, 16k
residual points, 2^18 map) with the measurement reduction computed by
(a) the default XLA path (``_measurement_system`` matmuls) and (b) the
fused Pallas kernel (``ops/pallas_p2p.py``), on the attached device.
Also checks trajectory equivalence over the timed scans.

Reference hot loop: slam/mapping/fastlio/src/laserMapping.cpp:813-983.

Usage: python -m lsd_tpu.tools.bench_pallas [--scans 100]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_variant(cfg, data, nav0, n_warm):
    import jax
    import jax.numpy as jnp

    from ..slam import lio_init, lio_step

    st = lio_init(cfg, nav0)
    for (P_, S_, M_, I_, IM_, _) in data[:n_warm]:
        st, info = lio_step(cfg, st, P_, S_, M_, I_, IM_)
    _ = jax.device_get(st.nav.pos)
    t0 = time.perf_counter()
    poses = []
    for (P_, S_, M_, I_, IM_, _) in data[n_warm:]:
        st, info = lio_step(cfg, st, P_, S_, M_, I_, IM_)
        poses.append(st.nav.pos)
    _ = jax.device_get(poses[-1])
    dt = time.perf_counter() - t0
    return dt / (len(data) - n_warm), np.stack([np.asarray(p) for p in poses])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=100)
    ap.add_argument("--points", type=int, default=2 ** 15)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lsd_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from ..utils.device import keep_session_alive
    keep_session_alive()

    from ..geometry import so3
    from ..sim import CircleSim, SimConfig
    from ..slam import LioConfig
    from ..slam.state import init_state

    n_warm = 5
    cap = args.points
    sim = CircleSim(SimConfig(n_scans=n_warm + args.scans,
                              points_per_scan=cap, point_noise=0.01, seed=7))
    data = sim.generate(capacity=cap, imu_capacity=16)
    _ = jax.device_get(jnp.zeros(1))      # force synchronous tunnel mode
    dev = [tuple(jax.device_put(jnp.asarray(a)) for a in d[:5]) + (d[5],)
           for d in data]
    R, p = sim.pose(0.0)
    nav0 = init_state()._replace(
        pos=jnp.asarray(p, jnp.float32),
        quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
        vel=jnp.asarray(sim.velocity(0.0), jnp.float32))
    base = LioConfig(ds_capacity=16384, map_capacity=2 ** 18,
                     scan_voxel=0.4, map_voxel=0.4, max_iters=4)

    ms_xla, pos_xla = run_variant(base, dev, nav0, n_warm)
    ms_pal, pos_pal = run_variant(
        base._replace(use_pallas_p2p=True), dev, nav0, n_warm)

    drift = float(np.max(np.linalg.norm(pos_xla - pos_pal, axis=1)))
    print(json.dumps(dict(
        backend=jax.default_backend(),
        xla_ms_per_scan=round(ms_xla * 1e3, 3),
        pallas_ms_per_scan=round(ms_pal * 1e3, 3),
        speedup=round(ms_xla / ms_pal, 3),
        max_traj_divergence_m=round(drift, 6),
    )))


if __name__ == "__main__":
    main()

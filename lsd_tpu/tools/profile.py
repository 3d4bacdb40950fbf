"""Profiling harness: per-stage timing + optional jax.profiler traces.

The reference's observability is EMA FPS counters and wall-clock warnings
scattered through the stages (SURVEY.md §5.1); the TPU-native equivalent
is a replay-driven profile: run recorded frames through the LIO (or a
full pipeline config), report per-stage milliseconds, and optionally dump
a jax.profiler trace directory viewable in TensorBoard/XProf.

Usage:
    python -m lsd_tpu.tools.profile --recording DIR [--trace /tmp/trace]
"""
from __future__ import annotations

import argparse
import contextlib
import time
from typing import Dict, List, Optional


def profile_lio_replay(recording: str, trace_dir: Optional[str] = None,
                       max_frames: int = 100,
                       point_capacity: int = 2 ** 15) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..io.player import FramePlayer
    from ..slam import LioConfig, lio_init, lio_step

    cfg = LioConfig(ds_capacity=16384, map_capacity=2 ** 18,
                    scan_voxel=0.4, map_voxel=0.4, max_iters=4)
    st = lio_init(cfg)
    player = FramePlayer(recording, point_capacity=point_capacity)

    t_parse: List[float] = []
    t_step: List[float] = []
    ctx = (jax.profiler.trace(trace_dir) if trace_dir
           else contextlib.nullcontext())
    n = 0
    with ctx:
        for frame in player:
            if n >= max_frames or frame.scan is None:
                break
            t0 = time.perf_counter()
            pts = jnp.asarray(frame.scan.points[:, :3])
            stamps = jnp.asarray(frame.scan.stamps)
            mask = jnp.asarray(frame.scan.mask)
            if frame.imu is not None and len(frame.imu.data):
                m = frame.imu.data.shape[0]
                imu_np = frame.imu.data.astype(np.float32).copy()
                imu_np[:, 0] = (imu_np[:, 0] - imu_np[0, 0]) / 1e6
                imu = jnp.asarray(imu_np)
                imu_mask = jnp.asarray(frame.imu.mask)
            else:
                imu = jnp.zeros((1, 7), jnp.float32)
                imu_mask = jnp.zeros((1,), bool)
            t1 = time.perf_counter()
            st, info = lio_step(cfg, st, pts, stamps, mask, imu, imu_mask)
            # no per-step fetch: sync only (device->host fetches flip
            # tunneled TPU sessions into slow synchronous dispatch)
            jax.block_until_ready(st.nav.pos)
            t2 = time.perf_counter()
            t_parse.append((t1 - t0) * 1000)
            t_step.append((t2 - t1) * 1000)
            n += 1

    def stats(xs):
        xs = np.asarray(xs[3:] if len(xs) > 6 else xs)  # drop compile steps
        return dict(mean=float(xs.mean()), p50=float(np.median(xs)),
                    p95=float(np.percentile(xs, 95)), max=float(xs.max()))

    report = dict(frames=n,
                  host_parse_ms=stats(t_parse),
                  device_step_ms=stats(t_step))
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--recording", required=True)
    ap.add_argument("--trace", default=None,
                    help="jax.profiler trace output directory")
    ap.add_argument("--max-frames", type=int, default=100)
    args = ap.parse_args(argv)
    import json
    report = profile_lio_replay(args.recording, args.trace, args.max_frames)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""MFU / roofline accounting for the hot kernels (VERDICT r2 next #2).

Answers, with measurements rather than wall-clock alone: how far from the
chip's speed-of-light does each headline stage run, and which resource
binds it?

Methodology
-----------
- **Peaks are measured, not quoted**: `measure_peaks()` times a large
  bf16 matmul (MXU peak) and a large f32 copy-add (HBM peak) on the
  attached chip.  Datasheet numbers for the TPU v5e class (197 bf16
  TFLOP/s, 819 GB/s HBM) are reported alongside for context.
- **FLOPs** come from XLA's compiled cost analysis (exact for the
  matmul/conv-dominated stages: detection, PGO).
- **Bytes** are NOT taken from XLA's cost model: for gather/scatter code
  XLA charges every gather with its whole operand (the LIO step "reads"
  58 GB/scan by that accounting — 7x over HBM peak, i.e. meaningless).
  Instead each stage carries an *analytic minimum-traffic model* derived
  from its access pattern (documented per stage below); achieved GB/s =
  analytic bytes / measured time, always <= the true traffic.
- A stage whose achieved compute AND bandwidth are both far below peak is
  **latency-bound** (serialized small kernels, sort networks, sequential
  dependencies) — the honest binding resource for most SLAM stages, and
  the thing to fix by fusing/batching, not by faster math.

Reference hot loops this instruments: SURVEY.md §3 (a) FAST-LIO residual
iteration (laserMapping.cpp:813-983), (b) voxelize+backbone inference
(lidar_inference.cpp:78-100), (c) NDT/GICP alignment, (d) graph optimize.
"""
from __future__ import annotations

import functools
import json
import time
from typing import Callable, Dict, Optional, Tuple

import numpy as np

# datasheet class numbers for context (per chip)
DATASHEET = {
    "TPU v5 lite": dict(bf16_tflops=197.0, hbm_gbps=819.0),
    "cpu": dict(bf16_tflops=0.1, hbm_gbps=20.0),
}


def _device_kind() -> str:
    import jax
    return jax.devices()[0].device_kind


def datasheet_peaks() -> Dict[str, float]:
    kind = _device_kind()
    for k, v in DATASHEET.items():
        if k in kind:
            return v
    return DATASHEET["cpu"]


def measure_peaks(size_mm: int = 4096, size_copy_mb: int = 256,
                  inner: int = 32) -> Dict[str, float]:
    """Measured single-chip peaks: bf16 matmul TFLOP/s + f32 stream GB/s.

    The ``inner`` chained iterations run inside ONE jitted fori_loop —
    on the tunneled transport every dispatch costs ~1.5 ms synchronous
    overhead, so per-op python loops measure the tunnel, not the chip
    (first version read 38 TFLOP/s on a 197 TFLOP/s part)."""
    import jax
    import jax.numpy as jnp
    _ = jax.device_get(jnp.zeros(1))          # force synchronous transport

    a = jnp.ones((size_mm, size_mm), jnp.bfloat16)

    @jax.jit
    def mm_chain(x, y):
        return jax.lax.fori_loop(0, inner, lambda i, c: y @ c * 0.5 + x * 0.5,
                                 x)
    _ = jax.device_get(mm_chain(a, a)[0, 0])  # compile+warm
    t0 = time.perf_counter()
    out = mm_chain(a, a)
    _ = jax.device_get(out[0, 0])
    dt = (time.perf_counter() - t0) / inner
    mxu_tflops = 2 * size_mm ** 3 / dt / 1e12

    n = size_copy_mb * 1024 * 1024 // 4
    b = jnp.ones((n,), jnp.float32)

    @jax.jit
    def add_chain(x):
        return jax.lax.fori_loop(0, inner, lambda i, c: c + 1.0, x)
    _ = jax.device_get(add_chain(b)[0])
    t0 = time.perf_counter()
    out = add_chain(b)
    _ = jax.device_get(out[0])
    dt = (time.perf_counter() - t0) / inner
    hbm_gbps = 2 * n * 4 / dt / 1e9           # read + write

    return dict(measured_mxu_tflops=round(mxu_tflops, 1),
                measured_hbm_gbps=round(hbm_gbps, 1),
                **datasheet_peaks())


def stage_report(name: str, ms: float, flops: float, min_bytes: float,
                 peaks: Dict[str, float], note: str = "") -> Dict:
    """One roofline row.  ``min_bytes`` is the analytic minimum traffic."""
    t = ms / 1e3
    ach_tf = flops / t / 1e12 if t > 0 else 0.0
    ach_gb = min_bytes / t / 1e9 if t > 0 else 0.0
    p_mxu = 100.0 * ach_tf / peaks.get("measured_mxu_tflops", peaks["bf16_tflops"])
    p_hbm = 100.0 * ach_gb / peaks.get("measured_hbm_gbps", peaks["hbm_gbps"])
    if p_mxu >= p_hbm and p_mxu > 15.0:
        bound = "compute (MXU)"
    elif p_hbm > p_mxu and p_hbm > 15.0:
        bound = "memory (HBM)"
    else:
        bound = "latency (serialized small kernels / sequential deps)"
    return dict(stage=name, ms=round(ms, 3),
                gflops=round(flops / 1e9, 2),
                min_traffic_mb=round(min_bytes / 1e6, 1),
                achieved_tflops=round(ach_tf, 3),
                achieved_gbps=round(ach_gb, 1),
                pct_peak_compute=round(p_mxu, 1),
                pct_peak_bandwidth=round(p_hbm, 1),
                bound=bound, note=note)


def xla_flops(jitted, *args, **kwargs) -> float:
    """Exact FLOPs of the compiled program (XLA cost analysis)."""
    comp = jitted.lower(*args, **kwargs).compile()
    ca = comp.cost_analysis()
    ca = ca if isinstance(ca, dict) else ca[0]
    return float(ca.get("flops", 0.0))


# ---------------------------------------------------------------------------
# Analytic minimum-traffic models (bytes) per stage.  f32 = 4 bytes.
# These count each tensor ONCE per necessary pass (algorithmic minimum);
# real traffic is >= this, so %-of-peak is an upper bound on efficiency.
# ---------------------------------------------------------------------------

def lio_traffic_model(cfg, raw_cap: int) -> Dict[str, float]:
    """Per-phase minimum bytes for one LIO scan step.

    Phases (mirrors slam/lio.py lio_step):
      undistort:  read raw pts+stamps, write undistorted pts
      downsample: sort-free minimum = read pts + write ds pts (the sort
                  network actually moves ~log2(N) passes more)
      match:      probe-key gather (N*7 probes * P slots * 4B) + moment
                  table stack (C*10*4B read+write once) + row gather
                  (N*7*10*4B)
      iterate:    per GN iter: H rows (N*24*4B write+read) + HtH matmul
                  reads; x iters
      insert:     moment comps (N*10*4B) + scattered updates (touched
                  voxels ~N * 10 * 4B read+write)
    """
    N = cfg.ds_capacity
    C = cfg.map_capacity
    it = cfg.max_iters
    f = 4.0
    from ..ops.surfel import SURFEL_PROBES
    undistort = raw_cap * (3 + 1 + 3) * f
    downsample = raw_cap * 4 * f + N * 4 * f
    match = (N * 7 * SURFEL_PROBES * f          # key probes
             + C * 10 * f * 2                   # moments SoA->AoS stack
             + N * 7 * 10 * f)                  # moment row gather
    iterate = it * (N * 24 * f * 2 + N * 24 * f)
    insert = N * 10 * f + N * 10 * f * 2
    total = undistort + downsample + match + iterate + insert
    return dict(undistort=undistort, downsample=downsample, match=match,
                iterate=iterate, insert=insert, total=total)


def detection_traffic_model(det_cfg, n_pts: int, params_bytes: float) -> float:
    """Minimum bytes for one detection forward: points in, voxel gather,
    BEV activations through the backbone (each map read+written once per
    conv), weights once."""
    H, W = det_cfg.grid_hw
    bev = H * W * det_cfg.pillar_filters * 2    # bf16 activations
    # backbone reads/writes each stage's activation ~2x per conv layer;
    # approximate with 6 stage-sized passes (2 blocks x 3 convs)
    return n_pts * 4 * 4 + 8 * bev + params_bytes


# ---------------------------------------------------------------------------
# LIO per-phase timing (device wall time of each phase jitted standalone)
# ---------------------------------------------------------------------------

def profile_lio_phases(cfg, st, P, S, M, I, IM, n_rep: int = 30) -> Dict[str, float]:
    """Time each internal phase of the LIO step on-device.

    Phases are jitted standalone from the same building blocks lio_step
    composes (slam/lio.py), so the sum approximates (from below, fusion
    across phases is lost) the full step.
    """
    import jax
    import jax.numpy as jnp
    from ..ops.voxelize import voxel_downsample
    from ..slam import lio as L
    from ..slam.imu import propagate, undistort

    _ = jax.device_get(jnp.zeros(1))

    @jax.jit
    def ph_prop(st, I, IM, P, S, M):
        nav_prop, P_prop, track = propagate(st.nav, st.P, I, IM,
                                            cfg.imu_noise, cfg.acc_scale)
        return undistort(P[:, :3], S, M, nav_prop, track)

    @jax.jit
    def ph_downsample(pts, M):
        return voxel_downsample(pts, M, cfg.scan_voxel, cfg.ds_capacity)

    @functools.partial(jax.jit, static_argnames=())
    def ph_match(st, ds_pts, ds_mask):
        return L._match_planes(cfg, st.nav, ds_pts, ds_mask, st.map)

    @jax.jit
    def ph_iterate(st, ds_pts, ds_mask, planes):
        H_, r, valid, inv_var = L._measurement_system(
            cfg, st.nav, ds_pts, ds_mask, st.map, planes=planes)
        w = valid.astype(ds_pts.dtype)
        Hw = H_ * (w * inv_var)[:, None]
        HtH = H_.T @ Hw
        Htr = Hw.T @ r
        E, nd, _ = L._gate_degenerate(cfg, HtH)
        return E @ HtH @ E.T, E @ Htr, nd

    @jax.jit
    def ph_insert(st, ds_pts, ds_mask):
        from ..ops.surfel import surfel_insert
        return surfel_insert(st.map, ds_pts, ds_mask)

    def timeit(fn, *args):
        out = fn(*args)
        _ = jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _i in range(n_rep):
            out = fn(*args)
        _ = jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / n_rep * 1e3

    pts_und = ph_prop(st, I, IM, P, S, M)
    ds_pts, ds_mask = ph_downsample(pts_und, M)
    ds_pts = ds_pts[:, :3]
    planes = ph_match(st, ds_pts, ds_mask)

    res = {
        "propagate+undistort": timeit(ph_prop, st, I, IM, P, S, M),
        "voxel_downsample": timeit(ph_downsample, pts_und, M),
        "match(surfel gather+planes)": timeit(ph_match, st, ds_pts, ds_mask),
        "iterate(residual+HtH+gate) x1": timeit(ph_iterate, st, ds_pts, ds_mask, planes),
        "map_insert(scatter)": timeit(ph_insert, st, ds_pts, ds_mask),
    }
    return res


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", action="store_true", help="print JSON only")
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

    from ..sim import CircleSim, SimConfig
    from ..slam import LioConfig, lio_init, lio_step

    peaks = measure_peaks()
    out = dict(device=_device_kind(), peaks=peaks)

    CAP = 2 ** 15
    sim = CircleSim(SimConfig(n_scans=12, points_per_scan=CAP,
                              point_noise=0.01, seed=7))
    data = sim.generate(capacity=CAP, imu_capacity=16)
    cfg = LioConfig(ds_capacity=16384, map_capacity=2 ** 18,
                    scan_voxel=0.4, map_voxel=0.4, max_iters=4)
    st = lio_init(cfg)
    dev = [tuple(jax.device_put(jnp.asarray(a)) for a in d[:5]) for d in data]
    for (P, S, M, I, IM) in dev[:10]:
        st, _info = lio_step(cfg, st, P, S, M, I, IM)
    _ = jax.device_get(st.nav.pos)
    (P, S, M, I, IM) = dev[10]

    # full step timing
    n_rep = 30
    t0 = time.perf_counter()
    st2 = st
    for _i in range(n_rep):
        st2, _info = lio_step(cfg, st2, P, S, M, I, IM)
    _ = jax.device_get(st2.nav.pos)
    lio_ms = (time.perf_counter() - t0) / n_rep * 1e3

    phases = profile_lio_phases(cfg, st, P, S, M, I, IM)
    model = lio_traffic_model(cfg, CAP)
    lio_flops = xla_flops(lio_step, cfg, st, P, S, M, I, IM)
    rows = [stage_report("lio_step (full)", lio_ms, lio_flops,
                         model["total"], peaks,
                         note="phases: " + ", ".join(
                             f"{k}={v:.2f}ms" for k, v in phases.items()))]

    ph_bytes = dict(zip(
        ["propagate+undistort", "voxel_downsample",
         "match(surfel gather+planes)", "iterate(residual+HtH+gate) x1",
         "map_insert(scatter)"],
        [model["undistort"], model["downsample"], model["match"],
         model["iterate"] / cfg.max_iters, model["insert"]]))
    for k, ms in phases.items():
        rows.append(stage_report("lio/" + k, ms, 0.0, ph_bytes[k], peaks))

    print(json.dumps(dict(out, rows=rows), indent=None if args.json else 2))
    return dict(out, rows=rows)


if __name__ == "__main__":
    main()

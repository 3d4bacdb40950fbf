"""Map-based localization: global relocalization + NDT/UKF tracking.

Host-side re-derivation of the reference's localization stack
(slam/localization/src/localization.cpp + global_localization.cpp +
hdl_localization): load an LSD-format map, globally relocalize with
ScanContext (+ ICP verification, optionally seeded by a user pose hint),
then track with UKF predict (IMU/const-vel) + NDT map matching, streaming
a local NDT target map from the keyframes around the vehicle
(localization.cpp runUpdateLocalMap:303-369).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry import so3
from ..geometry import np_so3
from ..ops.surfel import surfel_create, surfel_insert
from ..utils.precision import mxu_f32
from .keyframe import Keyframe, KeyframeStore
from .map_io import load_map
from .registration import icp_point_to_plane, ndt_align, ndt_build
from .scancontext import (make_descriptor, sc_db_add_batch,
                          sc_db_create, sc_query)
from .lio import LioConfig, lio_init, lio_step
from .ukf import (UkfConfig, UkfState, ukf_correct, ukf_correct_position,
                  ukf_init, ukf_pose, ukf_predict, ukf_predict_odom)


@functools.partial(jax.jit, static_argnames=("ukf_cfg", "has_imu",
                                             "has_odom",
                                             "ndt_iters", "ndt_searches",
                                             "icp_iters", "icp_searches",
                                             "track_voxel",
                                             "track_capacity"))
@mxu_f32
def localize_track_step(ukf_st: UkfState, ndt_map, icp_map,
                        points: jax.Array, mask: jax.Array, dt: jax.Array,
                        imu_gyro: jax.Array, imu_acc: jax.Array,
                        gps_xyz: jax.Array, gps_valid: jax.Array,
                        gps_var: jax.Array,
                        odom_dq: jax.Array = None,
                        odom_dt: jax.Array = None,
                        gate_t: jax.Array = None,
                        gate_ang: jax.Array = None,
                        gps_gate: jax.Array = None,
                        stamps: jax.Array = None,
                        ukf_cfg: UkfConfig = UkfConfig(),
                        has_imu: bool = False, has_odom: bool = False,
                        ndt_iters: int = 15, ndt_searches: int = 15,
                        icp_iters: int = 6, icp_searches: int = 2,
                        track_voxel: float = 0.0, track_capacity: int = 8192):
    """ONE fused localization tracking step: UKF predict -> NDT match ->
    ICP refine -> gated UKF pose correct -> optional GNSS position
    correct, as a single XLA program with a single small output fetch.

    The r3 step issued 4-5 separate dispatches with 4 host syncs
    (36.7 ms at ~0 % of both peaks — pure latency, BENCH_r03 roofline);
    the reference's equivalent loop is one in-process call chain
    (hdl_localization pose_estimator.cpp:64 predict/correct).  Gating
    (matched_frac / fitness thresholds) runs on-device via state
    selection so the miss bookkeeping on the host needs only the fetched
    scalars."""
    if gate_t is None:
        gate_t = jnp.asarray(1.0, jnp.float32)
    if gate_ang is None:
        gate_ang = jnp.asarray(np.deg2rad(10.0), jnp.float32)
    if gps_gate is None:
        gps_gate = jnp.asarray(2.5, jnp.float32)
    if has_odom:
        # LiDAR-inertial odometry increment drives the prediction (the
        # reference's localization fusion, docs/slam.md:200-214)
        st_pred = ukf_predict_odom(ukf_st, odom_dq, odom_dt, dt, ukf_cfg)
    else:
        st_pred = ukf_predict(ukf_st, dt, ukf_cfg,
                              imu_gyro if has_imu else None,
                              imu_acc if has_imu else None)
    T_pred = ukf_pose(st_pred)
    q0 = so3.matrix_to_quat(T_pred[:3, :3])
    t0 = T_pred[:3, 3]
    if stamps is not None:
        # Motion undistortion to the scan-END instant with the predicted
        # state's velocities (first-order: p += (w x p + v_b) * dt_i).
        # The map stores undistorted keyframe clouds (lio_step
        # points_und), but the r4 localizer matched the RAW sweep —
        # at 5 m/s a 0.1 s sweep skews 0.5 m, which showed up as a
        # ~0.24 m constant offset in the tracked pose (loc_diag r5).
        # The reference feeds motion-compensated clouds to
        # hdl_localization the same way (fastlio undistortion upstream).
        v_body = T_pred[:3, :3].T @ st_pred.x[3:6]
        w_body = st_pred.x[16:19]
        t_end = jnp.max(jnp.where(mask, stamps, 0.0))
        dt_i = (stamps - t_end)[:, None]
        points = points + (jnp.cross(jnp.broadcast_to(w_body, points.shape),
                                     points) + v_body) * dt_i
    if track_voxel > 0.0 and track_capacity < points.shape[0]:
        # voxel-downsample the tracking scan before the matchers: the
        # NDT runs at ~1 m voxels and the ICP against 0.5 m surfels, so
        # a 32k sweep carries ~4x redundant points per cell; the
        # association gathers (hash probe + per-point Gaussian loads)
        # dominate the step cost (BENCH r4: 24.7 ms of a 35.6 ms
        # pipelined step) and scale linearly with N.  ndt_omp likewise
        # voxel-filters its input cloud (reference hdl_localization
        # pipeline).  Accuracy parity at 0.4 m leaf measured in
        # loc_diag (EVAL r5).
        from ..ops.voxelize import voxel_downsample
        points, mask = voxel_downsample(points, mask, track_voxel,
                                        track_capacity)
        points = points[:, :3]
    q, t, ndt_info = ndt_align(ndt_map, points, mask, q0, t0,
                               iters=ndt_iters, searches=ndt_searches)
    q, t, icp_info = icp_point_to_plane(icp_map, points, mask, q, t,
                                        iters=icp_iters,
                                        searches=icp_searches)
    matched = ndt_info["matched_frac"]
    fitness = icp_info["fitness"]
    ok = (matched > 0.15) & (fitness > 0.2)
    if has_odom:
        # Innovation gate vs the odometry-driven prediction.  With LIO
        # increments the prediction is mm-accurate per frame, so a map
        # match that lands far from it is an aliased branch of a
        # self-similar map, not a correction: measured on the
        # figure-eight world, the crossing region yields NDT/ICP
        # convergence onto the 180-degree twin with matched_frac 0.77 —
        # the quality gate alone cannot see it (r4 fusion eval: 69-deg
        # heading excursions, meter-level flail, artifacts/
        # EVAL_r04_loc_fusion.json).  The reference fuses odometry and
        # NDT by covariance weighting (docs/slam.md:200-214,
        # hdl_localization pose_estimator.cpp:64); an explicit gate is
        # the robust equivalent when the odometry channel is this much
        # stiffer than the map match.  The thresholds are traced
        # scalars the HOST WIDENS with consecutive rejections: a fixed
        # gate turns a transient offset into permanent rejection of
        # correct matches (measured: 1.0 m fixed gate -> dead-reckoning
        # 4-7 m drift through the dropout tail) — widening re-admits
        # the map match once odometry alone has carried the filter
        # beyond the base gate.
        innov_t = jnp.linalg.norm(t - t0)
        innov_ang = 2.0 * jnp.arccos(jnp.clip(
            jnp.abs(jnp.sum(q * q0)), 0.0, 1.0))
        ok = ok & (innov_t < gate_t) & (innov_ang < gate_ang)
    else:
        innov_t = jnp.linalg.norm(t - t0)
        innov_ang = 2.0 * jnp.arccos(jnp.clip(
            jnp.abs(jnp.sum(q * q0)), 0.0, 1.0))
    st_corr = ukf_correct(st_pred, t, q, ukf_cfg)
    st_new = UkfState(x=jnp.where(ok, st_corr.x, st_pred.x),
                      P=jnp.where(ok, st_corr.P, st_pred.P))
    # GNSS innovation gate (both prediction models): a gross outlier fix
    # (multipath; the sim world injects 5-15 m outliers at RTK status)
    # entering ukf_correct_position at sigma 0.1 m yanks position AND
    # heading through the position<->attitude cross-covariance — the
    # measured trigger of the 130-deg heading excursions (loc_diag r5).
    # Mapping mode has an equivalent ingest gate (runtime/modules.py
    # ~5 m vs pose_ref); localization had none.
    p_now = st_new.x[0:3]
    gps_ok = gps_valid & (jnp.linalg.norm((gps_xyz - p_now)[:2]) < gps_gate)
    st_gps = ukf_correct_position(st_new, gps_xyz, gps_var)
    st_new = UkfState(x=jnp.where(gps_ok, st_gps.x, st_new.x),
                      P=jnp.where(gps_ok, st_gps.P, st_new.P))
    pose = ukf_pose(st_new)
    # diagnostics rider (fetched in the same batched device_get):
    # [innov_t, innov_ang, |gps innovation|]
    diag = jnp.stack([innov_t, innov_ang,
                      jnp.linalg.norm((gps_xyz - p_now)[:2])])
    return st_new, pose, matched, fitness, ok, gps_ok, diag


@dataclasses.dataclass
class LocalizerConfig:
    ndt_resolution: float = 1.0
    ndt_capacity: int = 2 ** 16
    local_map_radius: float = 45.0
    update_map_every: float = 5.0    # recentre local map after this travel (m)
    # tracking-scan voxel downsample before the NDT/ICP matchers (the
    # association gathers dominate the step; ndt_omp also voxel-filters
    # its input).  0 disables.
    track_voxel: float = 0.4
    track_capacity: int = 8192
    # NDT association rebuilds per step.  15 = exact classic NDT (every
    # iteration); with the LIO-odometry prediction the prior is mm-scale
    # so the voxel assignment is stable and fewer searches measure
    # accuracy-neutral (loc_diag r5); reloc still uses exact settings.
    ndt_searches: int = 15
    ndt_searches_odom: int = 4
    reloc_sc_thresh: float = 0.35
    reloc_fitness_thresh: float = 0.4
    # tracking-lost fallback (ref slam.cpp:440-455 fallback chain +
    # localization.cpp re-initialization): after this many consecutive
    # scans with a failed map match the filter is declared lost and the
    # localizer drops back to global relocalization instead of
    # dead-reckoning on IMU integration (which runs away quadratically
    # and drags the local-map window off the map).
    lost_after_misses: int = 10
    # run a lightweight LIO alongside localization and drive the UKF
    # prediction with its odometry increments when the caller provides
    # full scans+IMU (ref: FastLIO keeps running during localization,
    # fused per docs/slam.md:200-214).  Falls back to IMU/const-velocity
    # prediction when inputs or the LIO step are unavailable.
    # PRODUCTION DEFAULT since r5: the r4 meter-level "coasting drift"
    # that kept this opt-in was root-caused to a quaternion double-cover
    # bug in the UKF sigma-point moments (ukf._hemi_align) plus missing
    # GNSS/NDT innovation gates — with those fixed the fused mode holds
    # ~0.25 m / 0.6 deg through a 30 s GNSS dropout (loc_diag r5).
    use_lio_odometry: bool = True
    lio: LioConfig = dataclasses.field(default_factory=lambda: LioConfig(
        ds_capacity=8192, map_capacity=2 ** 17,
        scan_voxel=0.4, map_voxel=0.4, max_iters=3))
    ukf: UkfConfig = UkfConfig()


class Localizer:
    def __init__(self, map_dir: str, cfg: LocalizerConfig = LocalizerConfig()):
        self.cfg = cfg
        data = load_map(map_dir)
        self.store = KeyframeStore()
        kf_images = data.get("images") or [{}] * len(data["stamps"])
        for i, (s, T, c, im) in enumerate(zip(data["stamps"], data["poses"],
                                              data["clouds"], kf_images)):
            self.store.add(Keyframe(id=i, stamp_us=s, pose=T, odom=T, cloud=c,
                                    images=im))
        self.origin = data["origin"]
        self.origin_anchor = np.asarray(
            (data.get("meta") or {}).get("origin_anchor_xyz",
                                         [0.0, 0.0, 0.0]), float)
        # visual (ORB) relocalization DB over keyframe images, when present
        self.visual_db = None
        try:
            from .visual_reloc import VisualRelocDB
            db = VisualRelocDB()
            for kf in self.store.frames:
                for img in kf.images.values():
                    db.add(kf.id, img)
                    break
            if len(db):
                self.visual_db = db
        except RuntimeError:
            pass
        # ScanContext DB over keyframe clouds (in their own frame), built
        # in ONE batched dispatch: all clouds share one padding bucket and
        # vmapped descriptors land via sc_db_add_batch (a per-keyframe
        # loop costs a dispatch + a recompile per padding bucket — painful
        # at real map sizes; VERDICT.md round-1 weak #9)
        self.sc_db = sc_db_create(capacity=4096)
        if len(self.store):
            kmax = max(max((len(kf.cloud) for kf in self.store.frames)), 2)
            cap = 1 << int(np.ceil(np.log2(kmax)))
            K = len(self.store)
            pads = np.zeros((K, cap, 3), np.float32)
            msks = np.zeros((K, cap), bool)
            for i, kf in enumerate(self.store.frames):
                pts = kf.cloud[:, :3].astype(np.float32)
                pads[i, :len(pts)] = pts
                msks[i, :len(pts)] = True
            descs = jax.vmap(make_descriptor)(jnp.asarray(pads),
                                              jnp.asarray(msks))
            self.sc_db = sc_db_add_batch(self.sc_db, descs,
                                         jnp.ones((K,), bool))
        self.initialized = False
        self.ukf: Optional[UkfState] = None
        self.ndt_map = None
        self.map_center = None
        self.last_stamp_us: Optional[int] = None
        self.init_hint: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    def set_init_pose(self, pose: np.ndarray) -> None:
        """Interactive pose hint (ref: slam_wrapper setInitPoseRange)."""
        self.init_hint = np.asarray(pose, float)

    def set_init_pose_range(self, pose_range) -> None:
        """Pose hint as [x, y, z, roll, pitch, yaw] (ref slam.py
        set_init_pose: slam.set_init_pose(*pose_range[:6]))."""
        v = [float(x) for x in np.asarray(pose_range, float).reshape(-1)[:6]]
        T = np.eye(4)
        T[:3, :3] = np_so3.rpy_to_matrix(v[3], v[4], v[5])
        T[:3, 3] = v[:3]
        self.init_hint = T
        self.initialized = False   # force re-initialization from the hint

    def get_estimate_pose(self, x0: float, y0: float,
                          x1: float, y1: float) -> Optional[list]:
        """Relocalize the most recent scan against keyframes inside the
        given XY rectangle; returns a flattened 4x4 or None (ref slam.py
        get_estimate_pose -> slam.get_estimate_pose(x0, y0, x1, y1))."""
        if getattr(self, "_last_scan", None) is None:
            return None
        points, mask, image = self._last_scan
        lo = np.minimum([x0, y0], [x1, y1])
        hi = np.maximum([x0, y0], [x1, y1])
        pos = self.store.positions()
        in_rect = [i for i in range(len(pos))
                   if np.all(pos[i, :2] >= lo) and np.all(pos[i, :2] <= hi)]
        if not in_rect:
            return None
        hint, self.init_hint = self.init_hint, None
        try:
            # seed the generic relocalizer at the rectangle centre: the SC
            # candidate search stays global but ICP verifies against the
            # rect's neighborhood, rejecting out-of-area matches
            best = None
            for i in in_rect[:10]:
                self.init_hint = self.store[i].pose
                T = self._relocalize(points, mask, image=image)
                if T is not None and np.all(T[:2, 3] >= lo - 20) \
                        and np.all(T[:2, 3] <= hi + 20):
                    best = T
                    break
        finally:
            self.init_hint = hint
        return None if best is None else np.asarray(best).flatten().tolist()

    def _build_local_map(self, center) -> None:
        ids = self.store.within_radius(center, self.cfg.local_map_radius)
        cloud = self.store.merged_cloud(ids, max_points=2 ** 17)
        cap = 1 << int(np.ceil(np.log2(max(len(cloud), 2))))
        pad = np.zeros((cap, 3), np.float32)
        pad[:len(cloud)] = cloud[:, :3]
        m = np.zeros(cap, bool)
        m[:len(cloud)] = True
        self.ndt_map = ndt_build(jnp.asarray(pad), jnp.asarray(m),
                                 self.cfg.ndt_resolution, self.cfg.ndt_capacity)
        # companion surfel map for the precise ICP refinement stage
        # (surfel lookups are ~10x cheaper than kNN over raw points)
        icp_m = surfel_create(capacity=2 ** 17, voxel_size=0.5)
        self.icp_map = surfel_insert(icp_m, jnp.asarray(pad), jnp.asarray(m))
        self._local_cloud = (pad, m)
        self.map_center = np.asarray(center, float).copy()

    # ------------------------------------------------------------------
    def _relocalize(self, points, mask, image=None, gps_xyz=None,
                    ins_yaw=None) -> Optional[np.ndarray]:
        """Hint / ScanContext / ORB-visual / GNSS-seeded -> ICP verify ->
        initial pose (ref global_localization.cpp dual SC+ORB threads +
        setInitPoseRange GPS seeding)."""
        cand_pose = None
        yaw0 = 0.0
        if self.init_hint is not None:
            cand_pose = self.init_hint
        else:
            desc = make_descriptor(jnp.asarray(points[:, :3]), jnp.asarray(mask))
            idx, dist, yaw = sc_query(self.sc_db, desc, num_candidates=10,
                                      exclude_recent=0)
            if int(idx) >= 0 and float(dist) <= self.cfg.reloc_sc_thresh:
                cand_pose = self.store[int(idx)].pose
                yaw0 = float(yaw)
            elif image is not None and self.visual_db is not None:
                hits = self.visual_db.query(image)
                if hits:
                    cand_pose = self.store[hits[0][0]].pose
            if cand_pose is None and gps_xyz is not None:
                # GNSS-seeded candidate: ScanContext is genuinely
                # ambiguous along long straight stretches (every
                # descriptor looks alike); a current fix bounds the
                # position and the INS heading (or the nearest
                # keyframe's yaw) seeds the attitude, exactly the
                # reference's GPS-range reloc (setInitPoseRange ->
                # global_localization.cpp)
                ids = self.store.within_radius(
                    np.asarray(gps_xyz, float), 20.0)
                if ids:
                    pos = self.store.positions()
                    near = min(ids, key=lambda i: np.linalg.norm(
                        pos[i, :2] - np.asarray(gps_xyz)[:2]))
                    T0 = np.asarray(self.store[near].pose, float).copy()
                    T0[:3, 3] = np.asarray(gps_xyz, float)
                    T0[2, 3] = pos[near, 2]       # keep the map's height
                    if ins_yaw is not None:
                        T0[:3, :3] = np_so3.rpy_to_matrix(
                            0.0, 0.0, float(ins_yaw))
                    cand_pose = T0
            if cand_pose is None:
                return None
        # verify + refine with ICP against the neighborhood map
        center = cand_pose[:3, 3]
        ids = self.store.within_radius(center, self.cfg.local_map_radius)
        target = self.store.merged_cloud(ids, max_points=2 ** 16)
        if len(target) < 500:
            return None
        cap = 1 << int(np.ceil(np.log2(max(len(target), 2))))
        pad = np.zeros((cap, 3), np.float32)
        pad[:len(target)] = target[:, :3]
        tm = np.zeros(cap, bool)
        tm[:len(target)] = True
        m = surfel_create(capacity=2 ** 16, voxel_size=0.5)
        m = surfel_insert(m, jnp.asarray(pad), jnp.asarray(tm))
        Rz = np_so3.exp_so3([0.0, 0.0, -float(yaw0)])
        R0 = cand_pose[:3, :3] @ Rz
        q0 = so3.matrix_to_quat(jnp.asarray(R0, jnp.float32))
        t0 = jnp.asarray(cand_pose[:3, 3], jnp.float32)
        q, t, info = icp_point_to_plane(m, jnp.asarray(points[:, :3]), jnp.asarray(mask),
                                        q0, t0, iters=15, searches=5)
        if float(info["fitness"]) < self.cfg.reloc_fitness_thresh:
            return None
        T = np.eye(4)
        T[:3, :3] = np_so3.quat_to_matrix(np.asarray(q))
        T[:3, 3] = np.asarray(t)
        return T

    # ------------------------------------------------------------------
    def project_fix(self, lat: float, lon: float,
                    alt: float = 0.0) -> Optional[np.ndarray]:
        """GNSS fix -> map-frame xyz via the map's saved origin anchor
        (graph/map_info.txt + map_meta.json origin_anchor_xyz).

        The anchor is the MAP-FRAME position of the origin fix: a map
        whose frame does not start at (0,0,0) at that fix (session
        seeded mid-world, merged maps) would otherwise offset every
        projected fix by the anchor — a constant 45 m error on the
        route eval world (r5)."""
        if self.origin is None or np.size(self.origin) < 2:
            return None
        from ..geometry.utm import latlon_to_utm
        o = np.asarray(self.origin, float).reshape(-1)
        x0, y0, zone = latlon_to_utm(o[0], o[1])
        x, y, _ = latlon_to_utm(lat, lon, zone)
        alt0 = o[2] if o.size > 2 else 0.0
        a = np.asarray(self.origin_anchor, np.float32)
        return a + np.asarray([x - x0, y - y0, alt - alt0], np.float32)

    def _lio_increment(self, points, stamps, mask, imu, imu_mask):
        """Advance the side-running LIO; returns (dq, dtrans) — the
        body-frame SE3 increment since the previous scan — or None while
        the side filter is warming up / unhealthy.

        The side LIO cold-starts at identity, usually MID-MOTION (a
        localization session rarely begins at rest), so its first
        increments are convergence transients that must not drive the
        UKF (measured: feeding them pushed tracking into a 0.6 m/frame
        runaway that NDT could not out-vote under odometry-grade process
        noise).  Increments are withheld for a warm-up window and gated
        against the filter's own step magnitude."""
        if stamps is None or imu is None:
            return None
        if getattr(self, "_lio_state", None) is None:
            self._lio_state = lio_init(self.cfg.lio)
            self._lio_prev = np.eye(4)
            self._lio_n = 0
        self._lio_state, info = lio_step(
            self.cfg.lio, self._lio_state,
            jnp.asarray(points[:, :3]), jnp.asarray(stamps),
            jnp.asarray(mask), jnp.asarray(imu, jnp.float32),
            jnp.asarray(imu_mask))
        pose = np.asarray(jax.device_get(info["pose"]), float)
        dT = np.linalg.inv(self._lio_prev) @ pose
        self._lio_prev = pose
        self._lio_n += 1
        if self._lio_n <= 10 or not np.isfinite(dT).all():
            return None
        # consistency vs the localizer's own recent step (published pose
        # delta): an unconverged/degenerate LIO reports near-zero or
        # runaway motion — fall back to const-velocity for that frame
        mag = float(np.linalg.norm(dT[:3, 3]))
        if mag > 1.5:
            # absolute sanity bound (15 m/s at 10 Hz): a runaway or
            # divergent side filter must not drive the UKF.  The r4 gate
            # compared against the PUBLISHED pose's step instead — which
            # rejected mm-accurate increments exactly while the published
            # pose flailed on an aliased map match, removing the one
            # stabilising signal (loc_diag k=122-127: inc_used False with
            # inc_et 0.001 m during the flail)
            return None
        dq = np_so3.matrix_to_quat(dT[:3, :3]).astype(np.float32)
        return dq, dT[:3, 3].astype(np.float32)

    def process_scan(self, points, mask, stamp_us: int,
                     imu_gyro=None, imu_acc=None, image=None,
                     gps_xyz=None, gps_var: float = 4.0,
                     ins_yaw=None, stamps=None, imu=None,
                     imu_mask=None) -> Dict:
        """Feed one padded scan (sensor frame). Returns dict(pose, status).
        ins_yaw: optional ENU yaw (rad) from a trusted INS fix — used to
        arbitrate reloc hypotheses and tracked heading."""
        points = np.asarray(points, np.float32)
        mask = np.asarray(mask, bool)
        self._last_scan = (points, mask, image)
        # step the side-running LIO on EVERY scan (also while lost /
        # relocalizing) so its odometry stays continuous across gaps
        inc = (self._lio_increment(points, stamps, mask, imu, imu_mask)
               if self.cfg.use_lio_odometry else None)

        def yaw_of(Tm):
            return float(np.arctan2(Tm[1, 0], Tm[0, 0]))

        def yaw_diff(a, b):
            return abs((a - b + np.pi) % (2 * np.pi) - np.pi)

        if not self.initialized:
            T = self._relocalize(points, mask, image=image,
                                 gps_xyz=gps_xyz, ins_yaw=ins_yaw)
            if T is not None and gps_xyz is not None and \
                    np.linalg.norm(T[:2, 3] - np.asarray(gps_xyz)[:2]) > 20.0:
                # GNSS consistency gate on the reloc hypothesis: in
                # self-similar worlds (figure-eight lobes, parking rows)
                # a ScanContext+ICP match can land on an aliased twin; a
                # current fix within tens of meters arbitrates for free
                # (ref: setInitPoseRange seeds reloc from GPS,
                # global_localization.cpp)
                T = None
            if T is not None and ins_yaw is not None and \
                    yaw_diff(yaw_of(T), float(ins_yaw)) > 0.8:
                # INS-heading arbitration: a symmetric world admits
                # 180-degree-flipped hypotheses at the RIGHT position
                # (figure-eight crossing) — position gates cannot see
                # them; the INS heading can (ref hdl_graph_slam IMU
                # orientation edges / slam.cpp INS trust chain)
                T = None
            if T is None:
                return dict(pose=None, status="relocalizing")
            self.ukf = ukf_init(jnp.asarray(T, jnp.float32))
            self._build_local_map(T[:3, 3])
            self.initialized = True
            self.last_stamp_us = stamp_us
            self._prev_pub = np.asarray(T, float).copy()
            # The side LIO is deliberately NOT re-seeded at the map pose:
            # its increments are body-frame relative transforms, which
            # are invariant to its global frame, while overwriting
            # nav.pos/quat leaves its internal surfel map (built in the
            # old frame) inconsistent with the new pose — measured to
            # triple the increment error for ~100 frames after each
            # reloc (loc_diag: inc_et 0.0005 -> 0.02-0.03 post-reseed)
            return dict(pose=T, status="initialized")

        dt = max((stamp_us - self.last_stamp_us) / 1e6, 1e-3) if self.last_stamp_us else 0.1
        self.last_stamp_us = stamp_us
        # one fused device step (predict + NDT + ICP + gated corrections)
        # with a single small fetch — the r3 step paid 4 host syncs
        has_imu = imu_gyro is not None
        z3 = np.zeros(3, np.float32)
        # adaptive innovation gates (see localize_track_step): base
        # thresholds widen with consecutive rejections so a transient
        # offset cannot lock the filter out of its own map match
        misses = getattr(self, "_misses", 0)
        gate_t = min(1.0 + 0.1 * misses, self.cfg.local_map_radius / 3)
        gate_ang = np.deg2rad(min(10.0 + 1.0 * misses, 60.0))
        gps_rej = getattr(self, "_gps_rej", 0)
        gps_gate = min(2.5 + 0.5 * gps_rej, 30.0)
        self.ukf, T_dev, matched_dev, fitness_dev, ok_dev, gps_ok_dev, \
            diag_dev = localize_track_step(
                self.ukf, self.ndt_map, self.icp_map,
                jnp.asarray(points[:, :3]), jnp.asarray(mask),
                jnp.asarray(dt, jnp.float32),
                jnp.asarray(imu_gyro if has_imu else z3, jnp.float32),
                jnp.asarray(imu_acc if imu_acc is not None else z3,
                            jnp.float32),
                jnp.asarray(gps_xyz if gps_xyz is not None else z3,
                            jnp.float32),
                jnp.asarray(gps_xyz is not None),
                jnp.asarray(gps_var, jnp.float32),
                odom_dq=jnp.asarray(inc[0] if inc is not None
                                    else [1.0, 0, 0, 0], jnp.float32),
                odom_dt=jnp.asarray(inc[1] if inc is not None else z3,
                                    jnp.float32),
                gate_t=jnp.asarray(gate_t, jnp.float32),
                gate_ang=jnp.asarray(gate_ang, jnp.float32),
                gps_gate=jnp.asarray(gps_gate, jnp.float32),
                stamps=(jnp.asarray(stamps, jnp.float32)
                        if stamps is not None else None),
                ukf_cfg=self.cfg.ukf, has_imu=has_imu,
                has_odom=inc is not None,
                ndt_searches=(self.cfg.ndt_searches_odom
                              if inc is not None
                              else self.cfg.ndt_searches),
                track_voxel=self.cfg.track_voxel,
                track_capacity=self.cfg.track_capacity)
        T, matched, track_ok, gps_ok, step_diag = jax.device_get(
            (T_dev, matched_dev, ok_dev, gps_ok_dev, diag_dev))
        T = np.asarray(T, float)
        matched = float(matched)
        self.last_step_diag = dict(
            innov_t=float(step_diag[0]),
            innov_ang_deg=float(np.degrees(step_diag[1])),
            gps_innov=float(step_diag[2]), gate_t=gate_t,
            gate_ang_deg=float(np.degrees(gate_ang)),
            track_ok=bool(track_ok), gps_ok=bool(gps_ok))
        if gps_xyz is not None:
            self._gps_rej = 0 if bool(gps_ok) else gps_rej + 1
        if bool(track_ok):
            self._misses = 0
        else:
            self._misses = getattr(self, "_misses", 0) + 1
            # odometry-backed coasting tolerates far more rejected map
            # matches before declaring lost: with LIO increments driving
            # prediction at ~1 mm/frame error the filter dead-reckons
            # safely through an ambiguous region (the reference likewise
            # coasts on FastLIO odometry, docs/slam.md:200-214), whereas
            # const-velocity prediction runs away quadratically
            lost_after = (self.cfg.lost_after_misses * 6
                          if inc is not None else self.cfg.lost_after_misses)
            if self._misses >= lost_after:
                # tracking lost: back to global relocalization (ref
                # fallback chain) rather than dead-reckoning away
                self.initialized = False
                self._misses = 0
                return dict(pose=None, status="lost")
        # GNSS consistency watchdog: in self-similar worlds the NDT/ICP
        # matcher can slide onto an aliased branch with a HIGH matched
        # fraction, so the miss counter never fires; a persistent
        # disagreement with an available fix is the unambiguous lost
        # signal (ref slam.cpp fallback chain + re-initialization,
        # localization.cpp).  Sustained > 12 m for 5 fixes -> reinit
        # (reloc is itself GNSS-gated, so recovery lands on the right
        # branch).
        incons = False
        if gps_xyz is not None and \
                np.linalg.norm(T[:2, 3] - np.asarray(gps_xyz)[:2]) > 12.0:
            incons = True
        if ins_yaw is not None and \
                yaw_diff(yaw_of(T), float(ins_yaw)) > 0.8:
            incons = True          # flipped/aliased heading (see reloc gate)
        if gps_xyz is not None or ins_yaw is not None:
            if incons:
                self._gps_incons = getattr(self, "_gps_incons", 0) + 1
                if self._gps_incons >= 5:
                    self.initialized = False
                    self._gps_incons = 0
                    self._misses = 0
                    return dict(pose=None, status="lost")
            else:
                self._gps_incons = 0

        if np.linalg.norm(T[:3, 3] - self.map_center) > self.cfg.update_map_every:
            # coverage guard: only recentre while keyframes exist around
            # the new position — recentring onto a runaway pose builds an
            # empty map and makes the loss permanent
            if self.store.within_radius(T[:3, 3],
                                        self.cfg.local_map_radius):
                self._build_local_map(T[:3, 3])
            else:
                self._misses = getattr(self, "_misses", 0) + 1
        self._prev_pub = T.copy()
        return dict(pose=T, status="tracking", matched_frac=matched)

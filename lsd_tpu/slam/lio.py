"""Tightly-coupled LiDAR-inertial odometry: iterated error-state Kalman
filter on the 24-dim manifold state.

Re-derivation (not a port) of FAST-LIO2's update loop (reference:
slam/mapping/fastlio/src/laserMapping.cpp:813-983 h_share_model +
esekfom.hpp update_iterated_dyn_share_modified) as one jit-compiled
scan-step:

  propagate IMU -> undistort scan -> voxel-downsample -> iterate:
      kNN from voxel hash map -> plane fit -> point-to-plane residual
      + Jacobian -> MAP Gauss-Newton step with degeneracy eigen-gating
      (ref laserMapping.cpp:934-983) and optional wheelspeed/INS velocity
      observation (ref :794-812)
  -> covariance update -> insert scan into map -> recenter/trim map.

Everything is static-shape; points carry masks.  The whole step is a single
XLA program per (scan capacity) bucket — the HtH/Htr reductions are
(N x 24) matmuls that run on the MXU.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.hashmap import VoxelHashMap, hashmap_create, hashmap_insert, hashmap_knn, hashmap_trim
from ..ops.planefit import fit_planes
from ..ops.surfel import (SurfelMap, surfel_create, surfel_insert,
                          surfel_match, surfel_trim)
from ..ops.voxelize import voxel_downsample
from .imu import ImuNoise, propagate, undistort
from .state import (ERR_DIM, GRAVITY, IDX_V, NavState, boxminus, boxplus,
                    init_state)
from ..utils.precision import mxu_f32


class LioConfig(NamedTuple):
    # scan processing
    scan_voxel: float = 0.5          # downsample leaf for residual points (filter_size_surf)
    ds_capacity: int = 8192          # residual point budget
    # map
    map_capacity: int = 2 ** 17
    map_points_per_voxel: int = 8
    map_voxel: float = 0.5           # filter_size_map
    map_radius: float = 300.0        # local map half-extent (cube_side/2)
    recenter_thresh: float = 60.0    # trim when moved this far from map center
    # filter
    max_iters: int = 3
    meas_noise: float = 0.05         # point-to-plane sigma (m)
    vel_noise: float = 0.2           # wheelspeed/INS velocity sigma (m/s)
    # the velocity observation competes with ds_capacity point rows; the
    # reference scales its wheelspeed rows BY THE GEOMETRIC POINT COUNT
    # when its degeneracy detector fires (laserMapping.cpp:994-1006:
    # residual weight {1e-4, degenerate: 1e-3} * n_points).  Without
    # this, motion-aliased scans of a featureless tunnel contribute
    # enough FAKE along-axis information to pull the velocity estimate
    # ~4 % low and the fixed-weight velocity row cannot correct it
    # (EVAL r5 tunnel row).  The boost is gated on RELATIVE degeneracy
    # (n_weak: an axis far weaker than the strongest one) — the fake
    # tunnel info sits above the absolute gate but orders of magnitude
    # below the constrained axes.  Boosting unconditionally is wrong
    # the other way: it lets noisy INS velocity drag nominal odometry
    # (CPU campaign A odom ATE 0.0053 -> 0.0865 m when this scaled
    # always-on).
    vel_obs_point_frac: float = 0.1  # info multiplier = frac * n_valid
    degen_rel_frac: float = 0.05     # n_weak: lam_t < frac * lam_t_max
                                     # (translation block; tunnel 5e-3,
                                     # nominal worlds >= 0.16 measured)
    plane_thresh: float = 0.1        # plane inlier threshold (esti_plane)
    max_resid: float = 1.0           # residual gate (m)
    # re-run plane association when the iterate has moved this far from the
    # pose it was matched at (translation + 10 m-lever rotation, m).  This
    # is FAST-LIO's converge/rematch behaviour (laserMapping.cpp:1264
    # nearest_search_en on !converged); 0 disables re-search entirely.
    research_thresh: float = 0.05
    degen_thresh: float = 10.0       # eigenvalue gate on HtH pose block
    neighborhood: int = 7            # kNN voxel neighborhood (7/19/27);
                                     # 7 (faces+center) measures both faster
                                     # AND slightly more accurate than 19 on
                                     # the sim benchmark (0.021 vs 0.023 ATE)
    map_type: str = "surfel"         # "surfel" (moment voxels, fast) or
                                     # "points" (raw-K voxels + 5-NN fit)
    use_pallas_p2p: bool = False     # fused Pallas measurement reduction
                                     # (ops/pallas_p2p.py); numerically
                                     # equivalent to the XLA path
    est_extrinsic: bool = False
    est_gravity: bool = False
    imu_noise: ImuNoise = ImuNoise()
    acc_scale: float = GRAVITY       # converts accel units to m/s^2


class LioState(NamedTuple):
    nav: NavState
    P: jax.Array              # (24, 24)
    map: "SurfelMap | VoxelHashMap"   # per cfg.map_type
    map_center: jax.Array     # (3,)
    initialized: jax.Array    # () bool — map seeded
    step_count: jax.Array     # () int32


def lio_init(cfg: LioConfig, nav: Optional[NavState] = None) -> LioState:
    P = jnp.eye(ERR_DIM, dtype=jnp.float32) * 1e-4
    P = P.at[9:15, 9:15].set(jnp.eye(6) * 1e-3)   # bias uncertainty
    P = P.at[15:18, 15:18].set(jnp.eye(3) * 1e-2)  # gravity
    if cfg.map_type == "surfel":
        m = surfel_create(cfg.map_capacity, cfg.map_voxel)
    else:
        m = hashmap_create(cfg.map_capacity, cfg.map_points_per_voxel, cfg.map_voxel)
    return LioState(
        nav=nav if nav is not None else init_state(),
        P=P,
        map=m,
        map_center=jnp.zeros(3, jnp.float32),
        initialized=jnp.asarray(False),
        step_count=jnp.asarray(0, jnp.int32),
    )


def _update_mask(cfg: LioConfig) -> jnp.ndarray:
    m = jnp.ones((ERR_DIM,), jnp.float32)
    if not cfg.est_gravity:
        m = m.at[15:18].set(0.0)
    if not cfg.est_extrinsic:
        m = m.at[18:24].set(0.0)
    return m


def _match_planes(cfg: LioConfig, nav: NavState, pts_l: jax.Array,
                  mask: jax.Array, m: VoxelHashMap):
    """kNN + plane fit at the current pose (the expensive gather stage).

    Run once per scan at the propagated pose; the GN iterations reuse the
    plane set and only rebuild residuals/Jacobians — the per-iteration pose
    deltas are mm-scale, so plane association is stable (FAST-LIO likewise
    re-searches only when the iterate moved: laserMapping.cpp converge
    flag)."""
    pw = (pts_l @ nav.ext_rot.T + nav.ext_t) @ nav.rot.T + nav.pos
    if isinstance(m, SurfelMap):
        return surfel_match(m, pw, mask, cfg.plane_thresh)
    nbrs, nvalid = hashmap_knn(m, pw, mask, k=5, neighborhood=cfg.neighborhood)
    normals, d, plane_ok = fit_planes(nbrs, nvalid, cfg.plane_thresh)
    return normals, d, plane_ok, jnp.zeros_like(d)


def _measurement_system(cfg: LioConfig, nav: NavState, pts_l: jax.Array,
                        mask: jax.Array, m: VoxelHashMap,
                        planes=None):
    """Residuals + Jacobian rows for point-to-plane matching at state nav."""
    R = nav.rot
    Re = nav.ext_rot
    pb = pts_l @ Re.T + nav.ext_t                 # body (IMU) frame
    pw = pb @ R.T + nav.pos                       # world

    if planes is None:
        planes = _match_planes(cfg, nav, pts_l, mask, m)
    normals, d, plane_ok, plane_rms = planes
    r = jnp.einsum("ni,ni->n", pw, normals) + d

    # FAST-LIO validity gate: s = 1 - 0.9 |r| / sqrt(|p_l|)
    pnorm = jnp.linalg.norm(pts_l, axis=-1)
    s = 1.0 - 0.9 * jnp.abs(r) / jnp.sqrt(jnp.maximum(pnorm, 1e-3))
    valid = mask & plane_ok & (s > 0.9) & (jnp.abs(r) < cfg.max_resid)

    nR = normals @ R                               # n^T R, (N, 3)
    H = jnp.zeros((pts_l.shape[0], ERR_DIM), pts_l.dtype)
    H = H.at[:, 0:3].set(normals)                                  # d r / d p
    H = H.at[:, 3:6].set(-jnp.cross(nR, pb))                       # n^T R (-[pb]x) = -(n^T R) x pb
    if cfg.est_extrinsic:
        nRRe = nR @ Re
        H = H.at[:, 18:21].set(-jnp.cross(nRRe, pts_l))            # d r / d theta_ext
        H = H.at[:, 21:24].set(nR)                                 # d r / d t_ext
    # zero invalid rows so NaN/inf from degenerate fits can't leak through
    # the masked matmuls (NaN * 0 = NaN)
    finite = jnp.isfinite(r) & jnp.all(jnp.isfinite(H), axis=-1)
    valid = valid & finite
    H = jnp.where(valid[:, None], H, 0.0)
    r = jnp.where(valid, r, 0.0)
    # per-point measurement variance: base sigma + plane thickness (thick
    # or curved surfels are downweighted; adaptive like VGICP covariances)
    inv_var = 1.0 / (cfg.meas_noise ** 2 + plane_rms ** 2)
    return H, r, valid, inv_var


def _gate_degenerate(cfg: LioConfig, HtH: jax.Array):
    """Projection removing measurement influence along degenerate pose
    directions (eigenvalues of the 6x6 pose block below threshold).

    Also returns n_weak, a RELATIVE degeneracy count over the
    TRANSLATION block only: a motion-aliased sweep of a featureless
    tunnel contributes fake along-axis information well above the
    absolute threshold (so n_degenerate misses it) yet ~2 orders of
    magnitude below the constrained translation axes (measured: tunnel
    min/max 5e-3 vs nominal-world 0.16) — the signature the wheelspeed
    boost keys on.  The test must stay WITHIN the translation block:
    rotation eigenvalues carry different units (lever-arm^2 factors,
    naturally ~1e3 x smaller than translation's), so a full-6x6
    min/max ratio fires on every well-conditioned scan (this dragged
    the campaign's odometry when the boost keyed on it)."""
    A = HtH[0:6, 0:6]
    lam, V = jnp.linalg.eigh(A)
    keep = (lam >= cfg.degen_thresh).astype(A.dtype)
    Pi = (V * keep[None, :]) @ V.T
    E = jnp.eye(ERR_DIM, dtype=A.dtype).at[0:6, 0:6].set(Pi)
    n_degenerate = jnp.sum(1.0 - keep).astype(jnp.int32)
    lam_t = jnp.linalg.eigvalsh(A[3:6, 3:6])
    n_weak = jnp.sum(lam_t < cfg.degen_rel_frac * lam_t[-1]).astype(
        jnp.int32)
    return E, n_degenerate, n_weak


@functools.partial(jax.jit, static_argnames=("cfg",))
@mxu_f32
def lio_step(cfg: LioConfig, st: LioState,
             points: jax.Array, stamps: jax.Array, mask: jax.Array,
             imu: jax.Array, imu_mask: jax.Array,
             vel_obs: Optional[jax.Array] = None,
             vel_obs_valid: Optional[jax.Array] = None) -> Tuple[LioState, dict]:
    """Process one scan. points (N,3) lidar frame; stamps (N,) sec from scan
    start; imu (M,7) [t_sec_rel, gyro, accel].  Returns (state, info)."""
    if vel_obs is None:
        vel_obs = jnp.zeros(3, jnp.float32)
    if vel_obs_valid is None:
        vel_obs_valid = jnp.full((), False)

    # ---- IMU propagation + undistortion -------------------------------
    nav_prop, P_prop, track = propagate(st.nav, st.P, imu, imu_mask,
                                        cfg.imu_noise, cfg.acc_scale)
    pts_und = undistort(points[:, :3], stamps, mask, nav_prop, track)

    # ---- residual-point downsample ------------------------------------
    ds_pts, ds_mask = voxel_downsample(pts_und, mask, cfg.scan_voxel, cfg.ds_capacity)
    ds_pts = ds_pts[:, :3]

    upd_mask = _update_mask(cfg)
    P_inv = jnp.linalg.inv(P_prop + 1e-9 * jnp.eye(ERR_DIM))
    inv_v = 1.0 / (cfg.vel_noise ** 2)
    vw = jnp.where(vel_obs_valid, inv_v, 0.0)

    # plane association at the propagated pose; iterations reuse it unless
    # the iterate moves beyond research_thresh, in which case they re-search
    # (lax.cond pays the gather cost only when taken) — FAST-LIO's
    # converge/rematch flag (laserMapping.cpp:1264).
    planes = _match_planes(cfg, nav_prop, ds_pts, ds_mask, st.map)

    # iterate carries (nav, gated HtH + vel info, residual stats, planes,
    # match anchor); the last iteration's information matrix is reused for
    # the covariance update (the converged dx is tiny, matching FAST-LIO's
    # behaviour of updating P with the H of the final iteration).
    def iterate(i, carry):
        nav_i, _, _, planes, anchor = carry
        if cfg.research_thresh > 0:
            d_t = jnp.linalg.norm(nav_i.pos - anchor[0])
            d_r = jnp.linalg.norm(nav_i.quat - anchor[1] *
                                  jnp.sign(jnp.sum(nav_i.quat * anchor[1])))
            moved = (d_t + 20.0 * d_r) > cfg.research_thresh
            planes, anchor = jax.lax.cond(
                moved,
                lambda: (_match_planes(cfg, nav_i, ds_pts, ds_mask, st.map),
                         (nav_i.pos, nav_i.quat)),
                lambda: (planes, anchor))
        if cfg.use_pallas_p2p:
            from ..ops.pallas_p2p import p2p_reduce
            normals, dpl, plane_ok, plane_rms = planes
            inv_var = 1.0 / (cfg.meas_noise ** 2 + plane_rms ** 2)
            weight = jnp.where(ds_mask & plane_ok, inv_var, 0.0)
            HtH, Htr, pstats = p2p_reduce(
                ds_pts, normals, dpl, weight, nav_i.rot, nav_i.ext_rot,
                nav_i.ext_t, nav_i.pos, cfg.max_resid,
                est_extrinsic=cfg.est_extrinsic,
                interpret=jax.default_backend() != "tpu")
            n_pts_valid, sum_abs_r = pstats[0], pstats[1]
        else:
            H, r, valid, inv_var = _measurement_system(
                cfg, nav_i, ds_pts, ds_mask, st.map, planes=planes)
            w = valid.astype(ds_pts.dtype)
            Hw = H * (w * inv_var)[:, None]
            HtH = H.T @ Hw
            Htr = Hw.T @ r
            n_pts_valid = jnp.sum(w)
            sum_abs_r = jnp.sum(jnp.abs(r) * w)
        E, n_degen, n_weak = _gate_degenerate(cfg, HtH)
        HtH = E @ HtH @ E.T
        Htr = E @ Htr
        # velocity observation (wheelspeed / INS): fixed weight when the
        # geometry is well-conditioned; scaled with the competing point
        # count when any pose axis is RELATIVELY degenerate (reference
        # semantics, laserMapping.cpp:994-1006 — see vel_obs_point_frac)
        vw_i = vw * jnp.where(
            (n_degen > 0) | (n_weak > 0),
            jnp.maximum(1.0, cfg.vel_obs_point_frac * n_pts_valid), 1.0)
        HtH = HtH.at[IDX_V, IDX_V].add(jnp.eye(3) * vw_i)
        Htr = Htr.at[IDX_V].add(vw_i * (nav_i.vel - vel_obs))

        delta = boxminus(nav_i, nav_prop)
        A = HtH + P_inv
        b = Htr + P_inv @ delta
        dx = -jnp.linalg.solve(A, b) * upd_mask
        stats = jnp.stack([n_pts_valid, sum_abs_r,
                           n_degen.astype(jnp.float32),
                           n_weak.astype(jnp.float32)])
        return boxplus(nav_i, dx), HtH, stats, planes, anchor

    carry0 = (nav_prop, jnp.zeros((ERR_DIM, ERR_DIM), ds_pts.dtype),
              jnp.zeros(4, ds_pts.dtype), planes,
              (nav_prop.pos, nav_prop.quat))
    nav_new, HtH_last, stats, _, _ = jax.lax.fori_loop(
        0, cfg.max_iters, iterate, carry0)

    # ---- covariance update with the last iteration's information -------
    P_new = jnp.linalg.inv(HtH_last + P_inv)
    P_new = 0.5 * (P_new + P_new.T)

    # If the map is not yet seeded, keep the propagated state (first scan).
    nav_new = jax.tree.map(lambda a, b: jnp.where(st.initialized, a, b), nav_new, nav_prop)
    P_new = jnp.where(st.initialized, P_new, P_prop)

    # ---- map update ----------------------------------------------------
    if cfg.map_voxel == cfg.scan_voxel:
        ins_pts, ins_mask = ds_pts, ds_mask
    else:
        ins_pts, ins_mask = voxel_downsample(pts_und, mask, cfg.map_voxel, cfg.ds_capacity)
    R = nav_new.rot
    Re = nav_new.ext_rot
    ins_w = (ins_pts[:, :3] @ Re.T + nav_new.ext_t) @ R.T + nav_new.pos
    if isinstance(st.map, SurfelMap):
        new_map = surfel_insert(st.map, ins_w, ins_mask)
        trim_fn = surfel_trim
    else:
        new_map = hashmap_insert(st.map, ins_w, ins_mask)
        trim_fn = hashmap_trim

    moved = jnp.linalg.norm(nav_new.pos - st.map_center) > cfg.recenter_thresh
    new_map = jax.lax.cond(
        moved, lambda mm: trim_fn(mm, nav_new.pos, cfg.map_radius),
        lambda mm: mm, new_map)
    new_center = jnp.where(moved, nav_new.pos, st.map_center)

    info = dict(
        num_valid=stats[0].astype(jnp.int32),
        num_points=jnp.sum(ds_mask.astype(jnp.int32)),
        mean_residual=stats[1] / jnp.maximum(stats[0], 1.0),
        n_degenerate=stats[2].astype(jnp.int32),
        n_weak=stats[3].astype(jnp.int32),
        pose=nav_new.pose_matrix(),
        # motion-compensated scan in the scan-end lidar frame: keyframe
        # clouds MUST store this, not the raw sweep — at 5 m/s a 0.1 s
        # sweep skews ~0.5 m, which poisons loop-closure ICP and saved
        # maps (ref: graph_utils.cpp undistortion cloud save)
        points_und=pts_und,
        # per-IMU-sample propagated trajectory: the high-rate pose source
        # (ref fastlio.cpp prediction:18-100 / slam.cpp getTimedPose)
        imu_t=track["t"], imu_quat=track["quat"], imu_pos=track["pos"],
        vel=nav_new.vel,
    )
    new_st = LioState(nav=nav_new, P=P_new, map=new_map, map_center=new_center,
                      initialized=jnp.full((), True),
                      step_count=st.step_count + 1)
    return new_st, info


@functools.partial(jax.jit, static_argnames=("cfg",))
@mxu_f32
def lio_step_batch(cfg: LioConfig, st: LioState,
                   points: jax.Array, stamps: jax.Array, mask: jax.Array,
                   imu: jax.Array, imu_mask: jax.Array
                   ) -> Tuple[LioState, jax.Array]:
    """Process K scans in ONE dispatch via lax.scan.

    points (K, N, 3|4), stamps (K, N), mask (K, N), imu (K, M, 7),
    imu_mask (K, M) -> (state, poses (K, 4, 4)).

    Offline replay / mapping batches scans this way to amortize the
    per-dispatch host overhead (the dominant cost on tunneled TPU
    transports: the single-scan step is dispatch-bound, ROUND1.md);
    semantics are identical to K sequential lio_step calls.
    """
    def body(carry, xs):
        P, S, M, I, IM = xs
        new_st, info = lio_step.__wrapped__(cfg, carry, P, S, M, I, IM)
        return new_st, info["pose"]

    return jax.lax.scan(body, st, (points, stamps, mask, imu, imu_mask))

"""Unscented Kalman filter pose tracker for map-based localization.

Re-derivation of the reference's hdl_localization pose estimator
(slam/localization/hdl_localization/src/pose_estimator.cpp:64 — a 23-dim
UKF whose state stacks position, velocity, quaternion (as 4 plain
components, re-normalized after every mean), IMU biases, angular
velocity, and the IMU-mount quaternion; prediction is either a
constant-velocity model — which COASTS rotation through the angular
velocity state between NDT fixes — or IMU-driven, correction observes
the NDT pose [p, q]).  State (23,):

    [0:3] p, [3:6] v, [6:10] q (wxyz), [10:13] bg, [13:16] ba,
    [16:19] w (angular velocity, body), [19:23] q_imu (IMU mount)

The whole filter is tiny (47 sigma points x 23 dims) and runs as one XLA
program per predict/correct.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import so3
from ..utils.precision import mxu_f32

DIM = 23
OBS_DIM = 7
GRAVITY = 9.81


class UkfState(NamedTuple):
    x: jax.Array   # (23,)
    P: jax.Array   # (23, 23)


class UkfConfig(NamedTuple):
    # alpha=1 (lambda=0) keeps all sigma weights positive — the textbook
    # alpha=1e-3 gives weight_0 ~ -1e6, which destroys PSD-ness in f32
    alpha: float = 1.0
    beta: float = 2.0
    kappa: float = 0.0
    q_pos: float = 1e-4
    q_vel: float = 0.5
    q_quat: float = 1e-4
    q_bias: float = 1e-6
    q_angvel: float = 0.5
    q_mount: float = 1e-8     # IMU mount quat is essentially constant
    r_pos: float = 0.01       # NDT position noise (m^2-ish)
    r_quat: float = 0.001


def ukf_init(pose: Optional[jax.Array] = None) -> UkfState:
    x = jnp.zeros(DIM, jnp.float32).at[6].set(1.0).at[19].set(1.0)
    if pose is not None:
        q = so3.matrix_to_quat(pose[:3, :3])
        x = x.at[0:3].set(pose[:3, 3]).at[6:10].set(q)
    P = jnp.eye(DIM, dtype=jnp.float32) * 0.01
    P = P.at[19:23, 19:23].set(jnp.eye(4) * 1e-6)   # mount known a priori
    return UkfState(x=x, P=P)


def _sigma_points(x, P, cfg: UkfConfig):
    lam = cfg.alpha ** 2 * (DIM + cfg.kappa) - DIM
    S = jnp.linalg.cholesky((DIM + lam) * (P + 1e-9 * jnp.eye(DIM)))
    pts = jnp.concatenate([x[None, :], x[None, :] + S.T, x[None, :] - S.T], axis=0)
    wm = jnp.full((2 * DIM + 1,), 1.0 / (2 * (DIM + lam)))
    wm = wm.at[0].set(lam / (DIM + lam))
    wc = wm.at[0].add(1.0 - cfg.alpha ** 2 + cfg.beta)
    return pts, wm, wc


def _normalize_quat(x):
    q = so3.quat_normalize(x[..., 6:10])
    qm = so3.quat_normalize(x[..., 19:23])
    return x.at[..., 6:10].set(q).at[..., 19:23].set(qm)


def _hemi_align(Q):
    """Flip each row of (S, 4) onto the hemisphere of row 0.

    quat_normalize canonicalizes the sign to w >= 0, so propagated sigma
    points whose w component straddles zero (yaw near 180 deg) come back
    on OPPOSITE sides of the quaternion double cover; the linear
    mean/covariance then measures the ~2|q| artificial spread and the
    attitude covariance explodes (measured: |P_quat| 6e-5 -> 0.6 in
    three frames at the figure-eight's yaw-crossing, which is the root
    of the r4 localization heading excursions).  Aligning hemispheres
    before the moment computation removes the artifact; the covariance
    is invariant under a global sign flip, so the returned state can
    still be canonicalized."""
    s = jnp.where(jnp.einsum("sj,j->s", Q, Q[0]) < 0, -1.0, 1.0)
    return Q * s[:, None]


def _sigma_moments(pred, wm, wc):
    """Mean + covariance of propagated sigma points with double-cover-
    safe quaternion handling: hemisphere-align, magnitude-normalize the
    mean (no sign canonicalization — that would flip the mean off the
    aligned rows), moments, THEN canonicalize the returned mean."""
    pred = pred.at[:, 6:10].set(_hemi_align(pred[:, 6:10]))
    pred = pred.at[:, 19:23].set(_hemi_align(pred[:, 19:23]))
    mean = jnp.einsum("i,ij->j", wm, pred)
    nq = jnp.linalg.norm(mean[6:10])
    nm = jnp.linalg.norm(mean[19:23])
    mean = mean.at[6:10].mul(1.0 / jnp.maximum(nq, 1e-9))
    mean = mean.at[19:23].mul(1.0 / jnp.maximum(nm, 1e-9))
    d = pred - mean[None, :]
    P = jnp.einsum("i,ij,ik->jk", wc, d, d)
    return _normalize_quat(mean), P


@functools.partial(jax.jit, static_argnames=("cfg",))
@mxu_f32
def ukf_predict(st: UkfState, dt: jax.Array, cfg: UkfConfig = UkfConfig(),
                imu_gyro: Optional[jax.Array] = None,
                imu_acc: Optional[jax.Array] = None) -> UkfState:
    """Propagate sigma points with const-velocity (+optional IMU) model."""
    use_imu = imu_gyro is not None
    pts, wm, wc = _sigma_points(st.x, st.P, cfg)

    def f(s):
        p, v, q = s[0:3], s[3:6], so3.quat_normalize(s[6:10])
        bg, ba = s[10:13], s[13:16]
        w_st = s[16:19]
        q_imu = so3.quat_normalize(s[19:23])
        if use_imu:
            # rotate raw IMU rates/accels through the mount quaternion
            # (ref pose_estimator.cpp f_imu: q_imu * (gyro - bg))
            w = so3.quat_rotate(q_imu, imu_gyro - bg)
            a = so3.quat_rotate(q_imu, imu_acc - ba)
            q_new = so3.quat_normalize(so3.quat_mul(q, so3.quat_from_rotvec(w * dt)))
            acc_w = so3.quat_rotate(q, a) + np.asarray([0.0, 0.0, -GRAVITY], np.float32)
            v_new = v + acc_w * dt
            w_new = w
        else:
            # constant-velocity coasting INCLUDING rotation: the angular
            # velocity state keeps the attitude turning between NDT fixes
            # (the 16-dim round-1 filter froze attitude here)
            q_new = so3.quat_normalize(so3.quat_mul(q, so3.quat_from_rotvec(w_st * dt)))
            v_new = v
            w_new = w_st
        p_new = p + v * dt
        return (s.at[0:3].set(p_new).at[3:6].set(v_new)
                .at[6:10].set(q_new).at[16:19].set(w_new))

    pred = jax.vmap(f)(pts)
    mean, P = _sigma_moments(pred, wm, wc)
    Qd = jnp.concatenate([jnp.full(3, cfg.q_pos), jnp.full(3, cfg.q_vel),
                          jnp.full(4, cfg.q_quat), jnp.full(6, cfg.q_bias),
                          jnp.full(3, cfg.q_angvel), jnp.full(4, cfg.q_mount)])
    P = P + jnp.diag(Qd) * jnp.maximum(dt, 1e-3) + 1e-6 * jnp.eye(DIM)
    return UkfState(x=mean, P=0.5 * (P + P.T))


@functools.partial(jax.jit, static_argnames=("cfg",))
@mxu_f32
def ukf_predict_odom(st: UkfState, dquat: jax.Array, dtrans: jax.Array,
                     dt: jax.Array,
                     cfg: UkfConfig = UkfConfig()) -> UkfState:
    """Odometry-driven prediction: right-compose a measured body-frame
    SE3 increment (dquat, dtrans) into every sigma point.

    This is the reference's localization fusion shape — FULL LiDAR-
    inertial odometry keeps running during localization and the filter
    coasts on it between/through map-match observations
    (docs/slam.md:200-214; hdl fuses FastLIO odometry + NDT + GPS) —
    instead of the blind constant-velocity model, which loses the
    vehicle wherever the map match goes ambiguous (figure-eight
    crossing, GNSS dropout)."""
    pts, wm, wc = _sigma_points(st.x, st.P, cfg)

    def f(s):
        p, q = s[0:3], so3.quat_normalize(s[6:10])
        step_w = so3.quat_rotate(q, dtrans)
        p_new = p + step_w
        q_new = so3.quat_normalize(so3.quat_mul(q, dquat))
        inv_dt = 1.0 / jnp.maximum(dt, 1e-3)
        v_new = step_w * inv_dt
        w_new = so3.rotvec_from_quat(dquat) * inv_dt
        return (s.at[0:3].set(p_new).at[3:6].set(v_new)
                .at[6:10].set(q_new).at[16:19].set(w_new))

    pred = jax.vmap(f)(pts)
    mean, P = _sigma_moments(pred, wm, wc)
    # odometry increments are cm-accurate: much tighter process noise
    # than the const-velocity model on position/attitude
    Qd = jnp.concatenate([jnp.full(3, 1e-4), jnp.full(3, cfg.q_vel),
                          jnp.full(4, 1e-5), jnp.full(6, cfg.q_bias),
                          jnp.full(3, cfg.q_angvel), jnp.full(4, cfg.q_mount)])
    P = P + jnp.diag(Qd) * jnp.maximum(dt, 1e-3) + 1e-6 * jnp.eye(DIM)
    return UkfState(x=mean, P=0.5 * (P + P.T))


@functools.partial(jax.jit, static_argnames=("cfg",))
@mxu_f32
def ukf_correct(st: UkfState, obs_pos: jax.Array, obs_quat: jax.Array,
                cfg: UkfConfig = UkfConfig()) -> UkfState:
    """Observe [p, q] from the NDT matcher."""
    pts, wm, wc = _sigma_points(st.x, st.P, cfg)
    # align observation quaternion sign with the state mean
    obs_quat = jnp.where(jnp.dot(obs_quat, st.x[6:10]) < 0, -obs_quat, obs_quat)

    def h(s):
        return jnp.concatenate([s[0:3], so3.quat_normalize(s[6:10])])

    Z = jax.vmap(h)(pts)
    # hemisphere-align the observation quats (same double-cover hazard
    # as _sigma_moments: quat_normalize sign-canonicalizes, and sigma
    # points straddling w=0 land on opposite covers)
    Z = Z.at[:, 3:7].set(_hemi_align(Z[:, 3:7]))
    obs_quat = jnp.where(jnp.dot(obs_quat, Z[0, 3:7]) < 0,
                         -obs_quat, obs_quat)
    z_mean = jnp.einsum("i,ij->j", wm, Z)
    dz = Z - z_mean[None, :]
    dx = pts - st.x[None, :]
    R = jnp.diag(jnp.concatenate([jnp.full(3, cfg.r_pos), jnp.full(4, cfg.r_quat)]))
    S = jnp.einsum("i,ij,ik->jk", wc, dz, dz) + R
    C = jnp.einsum("i,ij,ik->jk", wc, dx, dz)
    K = jnp.linalg.solve(S.T, C.T).T
    z = jnp.concatenate([obs_pos, obs_quat])
    x_new = _normalize_quat(st.x + K @ (z - z_mean))
    P_new = st.P - K @ S @ K.T + 1e-6 * jnp.eye(DIM)
    return UkfState(x=x_new, P=0.5 * (P_new + P_new.T))


def ukf_pose(st: UkfState) -> jax.Array:
    from ..geometry import se3
    return se3.make_pose(so3.quat_to_matrix(st.x[6:10]), st.x[0:3])


@jax.jit
@mxu_f32
def ukf_correct_position(st: UkfState, obs_pos: jax.Array,
                         r_pos: jax.Array) -> UkfState:
    """Position observation (GNSS fix projected into the map frame).

    r_pos is the XY measurement variance (m^2) — large for single-point
    fixes, small for RTK; the Z axis is always near-unconstrained
    (variance 1e4): GNSS altitude lives on a different datum than the
    map's z, and a tight 3D correction drags the filter's height off the
    map, collapsing the scan match (mapping likewise constrains XY only,
    hdl_graph_slam gps_edge_stddev_xy).  Plays the reference's GPS
    branch of the covariance-weighted LIO/GPS fusion
    (docs/slam.md:200-214; hdl_localization pose_estimator)."""
    cfg = UkfConfig()
    pts, wm, wc = _sigma_points(st.x, st.P, cfg)
    Z = pts[:, 0:3]
    z_mean = jnp.einsum("i,ij->j", wm, Z)
    dz = Z - z_mean[None, :]
    dx = pts - st.x[None, :]
    R = jnp.diag(jnp.stack([r_pos, r_pos,
                            jnp.asarray(1e4, r_pos.dtype)]))
    S = jnp.einsum("i,ij,ik->jk", wc, dz, dz) + R
    C = jnp.einsum("i,ij,ik->jk", wc, dx, dz)
    K = jnp.linalg.solve(S.T, C.T).T
    x_new = _normalize_quat(st.x + K @ (obs_pos - z_mean))
    P_new = st.P - K @ S @ K.T + 1e-6 * jnp.eye(DIM)
    return UkfState(x=x_new, P=0.5 * (P_new + P_new.T))

"""IMU forward propagation, covariance propagation, and scan undistortion.

Re-derivation of FAST-LIO2's ImuProcess (reference:
slam/mapping/fastlio/src/IMU_Processing.hpp — forward propagation +
UndistortPcl; high-rate pose prediction in fastlio.cpp:18-100) as masked
``lax.scan``s over a fixed-capacity IMU batch.

Conventions:
- IMU samples: (M, 7) [t_sec, gx, gy, gz, ax, ay, az]; gyro rad/s, accel in
  g-units (reference GPCHC convention) scaled by ``acc_scale`` to m/s^2.
- Timestamps are seconds relative to scan start.
- Error-state transition uses the right-perturbation convention of
  state.py; see state.py for the 24-dim layout.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import so3
from .state import (ERR_DIM, IDX_BA, IDX_BG, IDX_G, IDX_P, IDX_R, IDX_V,
                    GRAVITY, NavState)


class ImuNoise(NamedTuple):
    gyr: float = 1e-3      # rad/s/sqrt(s)
    acc: float = 1e-2      # m/s^2/sqrt(s)
    bg_walk: float = 1e-5
    ba_walk: float = 1e-4


def _step_F(R: jax.Array, w: jax.Array, a: jax.Array, dt) -> jax.Array:
    """Discrete error-state transition for one IMU interval."""
    F = jnp.eye(ERR_DIM, dtype=R.dtype)
    I3 = jnp.eye(3, dtype=R.dtype)
    F = F.at[IDX_P, IDX_V].set(I3 * dt)
    F = F.at[IDX_R, IDX_R].set(so3.exp_so3(-w * dt))
    F = F.at[IDX_R, IDX_BG].set(-I3 * dt)
    F = F.at[IDX_V, IDX_R].set(-R @ so3.hat(a) * dt)
    F = F.at[IDX_V, IDX_BA].set(-R * dt)
    F = F.at[IDX_V, IDX_G].set(I3 * dt)
    return F


def propagate(state: NavState, P: jax.Array, imu: jax.Array, imu_mask: jax.Array,
              noise: ImuNoise, acc_scale: float = GRAVITY
              ) -> Tuple[NavState, jax.Array, dict]:
    """Propagate state+covariance through the IMU batch.

    Returns (state_end, P_end, track) where ``track`` holds per-sample
    poses for undistortion: t (M,), quat (M, 4), pos (M, 3), vel (M, 3).
    """
    dtype = P.dtype
    t = imu[:, 0].astype(dtype)
    dts = jnp.diff(t, prepend=t[:1])  # first sample gets dt=0
    dts = jnp.where(imu_mask, jnp.clip(dts, 0.0, 0.1), 0.0)

    def step(carry, inp):
        st, P = carry
        dt, meas, m = inp
        w = meas[1:4].astype(dtype) - st.bg
        a = meas[4:7].astype(dtype) * acc_scale - st.ba
        R = st.rot

        new_quat = so3.quat_normalize(so3.quat_mul(st.quat, so3.quat_from_rotvec(w * dt)))
        acc_w = (R @ a) + st.grav
        new_vel = st.vel + acc_w * dt
        new_pos = st.pos + st.vel * dt + 0.5 * acc_w * dt * dt

        F = _step_F(R, w, a, dt)
        Qd = jnp.zeros(ERR_DIM, dtype).at[IDX_R].set(noise.gyr ** 2)
        Qd = Qd.at[IDX_V].set(noise.acc ** 2)
        Qd = Qd.at[IDX_BG].set(noise.bg_walk ** 2)
        Qd = Qd.at[IDX_BA].set(noise.ba_walk ** 2)
        newP = F @ P @ F.T + jnp.diag(Qd) * dt

        new_st = st._replace(quat=new_quat, vel=new_vel, pos=new_pos)
        st_out = jax.tree.map(lambda n, o: jnp.where(m, n, o), new_st, st)
        P_out = jnp.where(m, newP, P)
        return (st_out, P_out), (st_out.quat, st_out.pos, st_out.vel)

    (state_end, P_end), (quats, poss, vels) = jax.lax.scan(
        step, (state, P), (dts, imu.astype(dtype), imu_mask), unroll=8)
    track = dict(t=t, quat=quats, pos=poss, vel=vels, mask=imu_mask)
    return state_end, P_end, track


def undistort(points: jax.Array, stamps: jax.Array, mask: jax.Array,
              state_end: NavState, track: dict) -> jax.Array:
    """Motion-compensate scan points to the scan-end lidar frame.

    points are in the lidar frame at their own capture time; returns points
    in the lidar frame at scan end (ref: UndistortPcl — backward propagation
    using the per-IMU-sample pose track).
    """
    t = track["t"]
    tmask = track["mask"]
    n_valid = jnp.maximum(jnp.sum(tmask.astype(jnp.int32)), 1)
    # invalid imu slots -> +inf so searchsorted ignores them
    t_search = jnp.where(tmask, t, jnp.inf)
    idx = jnp.clip(jnp.searchsorted(t_search, stamps, side="right") - 1, 0, t.shape[0] - 1)
    idx0 = jnp.clip(idx, 0, n_valid - 1)
    idx1 = jnp.clip(idx + 1, 0, n_valid - 1)

    t0, t1 = t[idx0], t[idx1]
    alpha = jnp.where(t1 > t0, (stamps - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0)
    alpha = jnp.clip(alpha, 0.0, 1.0)

    q = so3.quat_slerp(track["quat"][idx0], track["quat"][idx1], alpha[:, None])
    p = (1 - alpha[:, None]) * track["pos"][idx0] + alpha[:, None] * track["pos"][idx1]

    Re = so3.quat_to_matrix(state_end.ext_q)
    te = state_end.ext_t
    # lidar -> world at capture time: x_w = R(t) (Re x + te) + p(t)
    xb = points @ Re.T + te
    xw = so3.quat_rotate(q, xb) + p
    # world -> lidar at scan end
    R_end_T = state_end.rot.T
    xb_end = (xw - state_end.pos) @ R_end_T.T
    x_l_end = (xb_end - te) @ Re
    return jnp.where(mask[:, None], x_l_end, 0.0)


def rot_between(a: jax.Array, b: jax.Array) -> jax.Array:
    """Rotation matrix taking unit vector a to unit vector b."""
    a = a / jnp.maximum(jnp.linalg.norm(a), 1e-9)
    b = b / jnp.maximum(jnp.linalg.norm(b), 1e-9)
    v = jnp.cross(a, b)
    c = jnp.dot(a, b)
    s2 = jnp.dot(v, v)
    V = so3.hat(v)
    # Rodrigues with k = (1-c)/s^2; fall back to identity/flip for parallel
    k = jnp.where(s2 < 1e-12, 0.0, (1.0 - c) / jnp.maximum(s2, 1e-12))
    R = jnp.eye(3, dtype=a.dtype) + V + k * (V @ V)
    return jnp.where(c < -1.0 + 1e-8, -jnp.eye(3, dtype=a.dtype), R)


def static_init(imu_samples: jax.Array) -> Tuple[NavState, float]:
    """Initialize attitude/biases from a stationary IMU window.

    Mirrors ImuProcess::IMU_init: gyro mean -> bg, accel mean direction ->
    initial roll/pitch (gravity alignment), |mean accel| -> acc scale.
    Returns (state, acc_scale) with state.quat aligning body accel to +z.
    """
    from .state import init_state
    imu_samples = jnp.asarray(imu_samples)
    mean_gyr = jnp.mean(imu_samples[:, 1:4], axis=0)
    mean_acc = jnp.mean(imu_samples[:, 4:7], axis=0)
    acc_norm = jnp.linalg.norm(mean_acc)
    acc_scale = GRAVITY / jnp.maximum(acc_norm, 1e-6)
    R0 = rot_between(mean_acc / jnp.maximum(acc_norm, 1e-9), np.asarray([0.0, 0.0, 1.0], np.float32))
    st = init_state()._replace(bg=mean_gyr, quat=so3.matrix_to_quat(R0))
    return st, float(acc_scale)

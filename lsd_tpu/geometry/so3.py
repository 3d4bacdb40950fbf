"""SO(3) manifold operations in JAX.

TPU-native replacement for the Eigen rotation utilities used throughout the
reference (e.g. sensor_driver/common_lib/cpp_utils/src/Utils.cpp rpy/matrix
conversions and slam/mapping/fastlio's SO3 boxplus/boxminus from
IKFoM_toolkit).  Everything here is small-angle-safe, fully vectorized and
differentiable; rotations are represented either as 3x3 matrices or unit
quaternions in (w, x, y, z) order.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def _safe_norm(v: jax.Array, axis=-1, keepdims=True) -> jax.Array:
    """Norm with a well-defined (zero) gradient at v = 0.

    ``jnp.linalg.norm`` has a NaN gradient at the origin (d|v|/dv = v/|v|),
    which poisons every Jacobian evaluated at zero rotation vectors — the
    common case in Gauss-Newton linearization.
    """
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + 1e-18)


def hat(w: jax.Array) -> jax.Array:
    """Skew-symmetric matrix of w (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ], axis=-2)


def vee(W: jax.Array) -> jax.Array:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc(x):
    """sin(x)/x, safe at 0."""
    return jnp.where(jnp.abs(x) < 1e-5, 1.0 - x * x / 6.0, jnp.sin(x) / jnp.where(jnp.abs(x) < 1e-5, 1.0, x))


def _cosc(x):
    """(1-cos(x))/x^2, safe at 0."""
    x2 = x * x
    return jnp.where(jnp.abs(x) < 1e-4, 0.5 - x2 / 24.0,
                     (1.0 - jnp.cos(x)) / jnp.where(jnp.abs(x) < 1e-4, 1.0, x2))


def exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues formula: rotation vector (..., 3) -> rotation matrix (..., 3, 3)."""
    theta = _safe_norm(w)
    t = theta[..., None]  # (..., 1, 1)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + _sinc(t) * W + _cosc(t) * (W @ W)


def log_so3(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> rotation vector (..., 3).

    Handles angles near 0 and near pi (via the quaternion path, which is
    numerically stable everywhere).
    """
    return rotvec_from_quat(matrix_to_quat(R))


def left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian of SO(3): J_l(w) such that exp(w + dw) ~ exp(J_l dw) exp(w)."""
    theta = _safe_norm(w)[..., None]
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    t2 = theta * theta
    a = _cosc(theta)  # (1-cos)/t^2
    # (t - sin t)/t^3, safe at 0
    b = jnp.where(jnp.abs(theta) < 1e-4, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / jnp.where(jnp.abs(theta) < 1e-4, 1.0, t2 * theta))
    return I + a * W + b * (W @ W)


def inv_left_jacobian(w: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SO(3)."""
    theta = _safe_norm(w)[..., None]
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    t2 = theta * theta
    half = theta / 2.0
    # 1/t^2 - (1+cos t)/(2 t sin t), with series 1/12 + t^2/720 near 0
    cot_term = jnp.where(
        jnp.abs(theta) < 1e-4,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 / jnp.where(jnp.abs(theta) < 1e-4, 1.0, t2))
        - (1.0 + jnp.cos(theta)) / jnp.where(jnp.abs(theta) < 1e-4, 1.0, 2.0 * theta * jnp.sin(theta)),
    )
    return I - 0.5 * W + cot_term * (W @ W)


# ----------------------------- quaternions (w, x, y, z) ---------------------


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_conj(q: jax.Array) -> jax.Array:
    # np constant (not jnp): lowered as an inline HLO literal instead of a
    # captured device buffer, which costs a host round-trip per call on
    # tunneled TPU backends.
    return q * np.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    n = _safe_norm(q)
    q = q / jnp.maximum(n, _EPS)
    # canonicalize sign (w >= 0) so log is the short way around
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_from_rotvec(w: jax.Array) -> jax.Array:
    theta = _safe_norm(w)
    half = theta / 2.0
    k = 0.5 * _sinc(half)  # sin(t/2)/t
    return jnp.concatenate([jnp.cos(half), k * w], axis=-1)


def rotvec_from_quat(q: jax.Array) -> jax.Array:
    q = quat_normalize(q)
    w, v = q[..., :1], q[..., 1:]
    sin_half = _safe_norm(v)
    half = jnp.arctan2(sin_half, w)
    # rotvec = 2 * half * v / sin(half); v/sin_half safe as sin_half->0
    scale = jnp.where(sin_half < 1e-7, 2.0 / jnp.maximum(w, 0.5), 2.0 * half / jnp.maximum(sin_half, _EPS))
    return scale * v


def quat_to_matrix(q: jax.Array) -> jax.Array:
    q = quat_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ], axis=-2)


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Shepperd's method, branch-free via selecting the max-trace variant."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (unnormalized), one per "pivot".
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 pivots, 4)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by quaternion q (..., 4)."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == jnp.ndim(q0) - 1 else jnp.asarray(t)
    lin = (1.0 - t) * q0 + t * q1  # fallback for tiny angles
    w0 = jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS)
    w1 = jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS)
    out = jnp.where(sin_theta < 1e-6, lin, w0 * q0 + w1 * q1)
    return quat_normalize(out)


# ----------------------------- Euler (roll, pitch, yaw) ---------------------
# Convention matches the reference's INS frame handling (Utils.cpp
# getTransformFromRPYT): R = Rz(yaw) @ Ry(pitch) @ Rx(roll), angles in radians.


def rpy_to_matrix(rpy: jax.Array) -> jax.Array:
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack([
        jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
        jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
        jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
    ], axis=-2)


def matrix_to_rpy(R: jax.Array) -> jax.Array:
    sy = -R[..., 2, 0]
    cy = jnp.sqrt(jnp.clip(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2, 1e-12))
    pitch = jnp.arctan2(sy, cy)
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)

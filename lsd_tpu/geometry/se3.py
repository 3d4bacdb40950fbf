"""SE(3) rigid-transform operations in JAX.

Poses are 4x4 homogeneous matrices (batchable, (..., 4, 4)).  Replaces the
reference's Eigen::Matrix4d plumbing (slam/common/mapping_types.h PoseType,
cpp_utils transform helpers) with vectorized, differentiable JAX ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import so3

# np (not jnp) so it lowers as an inline HLO literal, not a captured device
# buffer (which costs a host round-trip per call on tunneled TPU backends).
_BOTTOM_ROW = np.asarray([0.0, 0.0, 0.0, 1.0], np.float32)


def make_pose(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(_BOTTOM_ROW.astype(R.dtype), batch + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def rotation(T: jax.Array) -> jax.Array:
    return T[..., :3, :3]


def translation(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def compose(T1: jax.Array, T2: jax.Array) -> jax.Array:
    return T1 @ T2


def inverse(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_pose(Rt, -(Rt @ t[..., None])[..., 0])


def exp_se3(xi: jax.Array) -> jax.Array:
    """se(3) twist (..., 6) = [rho, phi] -> SE(3) matrix (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3.exp_so3(phi)
    V = so3.left_jacobian(phi)
    t = (V @ rho[..., None])[..., 0]
    return make_pose(R, t)


def log_se3(T: jax.Array) -> jax.Array:
    """SE(3) -> twist (..., 6) = [rho, phi]."""
    phi = so3.log_so3(T[..., :3, :3])
    Vinv = so3.inv_left_jacobian(phi)
    rho = (Vinv @ T[..., :3, 3, None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply pose (..., 4, 4) to points (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def relative_pose(T_a: jax.Array, T_b: jax.Array) -> jax.Array:
    """T_a^-1 @ T_b — pose of b expressed in frame a."""
    return inverse(T_a) @ T_b


def pose_interp(T0: jax.Array, T1: jax.Array, t) -> jax.Array:
    """Interpolate between two poses: slerp rotation, lerp translation.

    Matches the semantics of the reference's INS motion interpolation
    (sensor_driver/ins_driver/src/ins_driver.cpp getMotion / getInterpolated).
    """
    q0 = so3.matrix_to_quat(T0[..., :3, :3])
    q1 = so3.matrix_to_quat(T1[..., :3, :3])
    q = so3.quat_slerp(q0, q1, t)
    p = (1.0 - t) * T0[..., :3, 3] + t * T1[..., :3, 3]
    return make_pose(so3.quat_to_matrix(q), p)

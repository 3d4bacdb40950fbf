"""ESIKF navigation state on manifold.

Re-derivation of the FAST-LIO2 state (reference:
slam/mapping/fastlio/include/use-ikfom.hpp:12-21 — pos, SO3 rot, lidar-IMU
extrinsic R/T, vel, gyro bias, accel bias, gravity) for JAX.  The nominal
state carries quaternions; the error state is a 24-vector:

    [0:3]   dp      position
    [3:6]   dtheta  rotation (so3, right-multiplied: R <- R Exp(dtheta))
    [6:9]   dv      velocity
    [9:12]  dbg     gyro bias
    [12:15] dba     accel bias
    [15:18] dg      gravity (3-vec; near-constant-norm is maintained by a
                    strong prior instead of the reference's S2 retraction —
                    same observable dof, XLA-friendlier)
    [18:21] dthe    lidar->IMU extrinsic rotation
    [21:24] dte     lidar->IMU extrinsic translation

All ops are pure functions of PyTrees; boxplus/boxminus mirror esekfom.hpp's
manifold +/-.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import so3

ERR_DIM = 24
IDX_P = slice(0, 3)
IDX_R = slice(3, 6)
IDX_V = slice(6, 9)
IDX_BG = slice(9, 12)
IDX_BA = slice(12, 15)
IDX_G = slice(15, 18)
IDX_ER = slice(18, 21)
IDX_ET = slice(21, 24)

GRAVITY = 9.81


class NavState(NamedTuple):
    pos: jax.Array    # (3,)
    quat: jax.Array   # (4,) wxyz, world <- body
    vel: jax.Array    # (3,)
    bg: jax.Array     # (3,)
    ba: jax.Array     # (3,)
    grav: jax.Array   # (3,) world gravity vector (~ [0, 0, -9.81])
    ext_q: jax.Array  # (4,) lidar -> IMU rotation
    ext_t: jax.Array  # (3,) lidar -> IMU translation

    @property
    def rot(self) -> jax.Array:
        return so3.quat_to_matrix(self.quat)

    @property
    def ext_rot(self) -> jax.Array:
        return so3.quat_to_matrix(self.ext_q)

    def pose_matrix(self) -> jax.Array:
        from ..geometry import se3
        return se3.make_pose(self.rot, self.pos)


def init_state(dtype=jnp.float32) -> NavState:
    return NavState(
        pos=jnp.zeros(3, dtype),
        quat=jnp.asarray([1.0, 0, 0, 0], dtype),
        vel=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        grav=jnp.asarray([0.0, 0.0, -GRAVITY], dtype),
        ext_q=jnp.asarray([1.0, 0, 0, 0], dtype),
        ext_t=jnp.zeros(3, dtype),
    )


def boxplus(x: NavState, dx: jax.Array) -> NavState:
    """x ⊞ dx with right-perturbation on rotations."""
    return NavState(
        pos=x.pos + dx[IDX_P],
        quat=so3.quat_normalize(so3.quat_mul(x.quat, so3.quat_from_rotvec(dx[IDX_R]))),
        vel=x.vel + dx[IDX_V],
        bg=x.bg + dx[IDX_BG],
        ba=x.ba + dx[IDX_BA],
        grav=x.grav + dx[IDX_G],
        ext_q=so3.quat_normalize(so3.quat_mul(x.ext_q, so3.quat_from_rotvec(dx[IDX_ER]))),
        ext_t=x.ext_t + dx[IDX_ET],
    )


def boxminus(x: NavState, y: NavState) -> jax.Array:
    """x ⊟ y: the error that takes y to x."""
    dq = so3.quat_mul(so3.quat_conj(y.quat), x.quat)
    dqe = so3.quat_mul(so3.quat_conj(y.ext_q), x.ext_q)
    return jnp.concatenate([
        x.pos - y.pos,
        so3.rotvec_from_quat(dq),
        x.vel - y.vel,
        x.bg - y.bg,
        x.ba - y.ba,
        x.grav - y.grav,
        so3.rotvec_from_quat(dqe),
        x.ext_t - y.ext_t,
    ])

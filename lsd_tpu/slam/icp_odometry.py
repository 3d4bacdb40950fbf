"""LiDAR-only scan-matching odometry (no IMU).

Re-derivation of the reference's scan_matching_odometry app
(slam/backend/hdl_graph_slam/apps/scan_matching_odometry_nodelet.cpp:415 —
frame-to-keyframe registration odometry used when no IMU/INS is present,
e.g. the RTKM/GNSS-only or lidar-only configs): maintain a local surfel
map, align each incoming scan to it with point-to-plane GN starting from a
constant-velocity prediction, and insert the aligned scan.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np
import jax.numpy as jnp

from ..geometry import so3
from ..geometry import np_so3
from ..ops import voxel_downsample
from ..ops.surfel import surfel_create, surfel_insert, surfel_match, surfel_trim
import jax
from ..utils.precision import mxu_f32


@dataclasses.dataclass
class IcpOdometryConfig:
    scan_voxel: float = 0.5
    ds_capacity: int = 8192
    map_capacity: int = 2 ** 17
    map_voxel: float = 0.5
    map_radius: float = 300.0
    recenter_thresh: float = 60.0
    iters: int = 8
    plane_thresh: float = 0.15


@jax.jit
@mxu_f32
def _align_step(m, pts, mask, q, t):
    pw = so3.quat_rotate(q[None], pts) + t
    normals, d, ok, _rms = surfel_match(m, pw, mask, 0.15)
    r = jnp.einsum("ni,ni->n", pw, normals) + d
    valid = mask & ok & (jnp.abs(r) < 1.0)
    w = valid.astype(pts.dtype)
    nR = normals @ so3.quat_to_matrix(q)
    H = jnp.concatenate([-jnp.cross(nR, pts), normals], axis=-1) * w[:, None]
    rw = r * w
    A = H.T @ H + 1e-4 * jnp.eye(6)
    b = H.T @ rw
    dx = -jnp.linalg.solve(A, b)
    q2 = so3.quat_normalize(so3.quat_mul(q, so3.quat_from_rotvec(dx[:3])))
    return q2, t + dx[3:], jnp.sum(w)


class IcpOdometry:
    def __init__(self, cfg: IcpOdometryConfig = IcpOdometryConfig()):
        self.cfg = cfg
        self.map = surfel_create(cfg.map_capacity, cfg.map_voxel)
        self.pose = np.eye(4)
        self.prev_delta = np.eye(4)     # constant-velocity prediction
        self.map_center = np.zeros(3)
        self.initialized = False

    def process_scan(self, points: np.ndarray, mask: np.ndarray) -> Dict:
        cfg = self.cfg
        pts = jnp.asarray(points, jnp.float32)[:, :3]
        msk = jnp.asarray(mask)
        ds, ds_mask = voxel_downsample(pts, msk, cfg.scan_voxel, cfg.ds_capacity)
        ds = ds[:, :3]

        if self.initialized:
            guess = self.pose @ self.prev_delta
            q = so3.matrix_to_quat(jnp.asarray(guess[:3, :3], jnp.float32))
            t = jnp.asarray(guess[:3, 3], jnp.float32)
            for _ in range(cfg.iters):
                q, t, nvalid = _align_step(self.map, ds, ds_mask, q, t)
            new_pose = np.eye(4)
            new_pose[:3, :3] = np_so3.quat_to_matrix(np.asarray(q))
            new_pose[:3, 3] = np.asarray(t)
            self.prev_delta = np.linalg.inv(self.pose) @ new_pose
            self.pose = new_pose
        else:
            nvalid = jnp.asarray(0.0)

        # insert into map at current pose
        Rw = jnp.asarray(self.pose[:3, :3], jnp.float32)
        tw = jnp.asarray(self.pose[:3, 3], jnp.float32)
        world = ds @ Rw.T + tw
        self.map = surfel_insert(self.map, world, ds_mask)
        if np.linalg.norm(self.pose[:3, 3] - self.map_center) > cfg.recenter_thresh:
            self.map = surfel_trim(self.map, jnp.asarray(self.pose[:3, 3], jnp.float32),
                                   cfg.map_radius)
            self.map_center = self.pose[:3, 3].copy()
        self.initialized = True
        return dict(pose=self.pose.copy(), num_valid=int(nvalid))

"""INS/IMU motion tracking: pose interpolation + per-frame motion.

Re-derivation of the reference's INS driver core semantics
(sensor_driver/ins_driver/src/ins_driver.cpp trigger/getMotion:236-312):
buffer GNSS/INS fixes and IMU samples; on each frame ``trigger(ts)``
returns the interpolated absolute pose, the relative motion since the last
trigger (the ego-motion 4x4 used for tracker compensation and multi-frame
point accumulation), and the IMU window covering the frame.
"""
from __future__ import annotations

from collections import deque
from typing import Deque, Dict, List, Optional, Tuple

import numpy as np

from ..geometry.utm import UTMProjector

# This module is host-side sensor plumbing that runs on receive threads —
# pure numpy on purpose.  Eager jnp here would dispatch tiny ops to the
# device per fix (and crashes outright when called from a non-main thread
# on tunneled TPU backends).


def _np_rpy_to_matrix(roll: float, pitch: float, yaw: float) -> np.ndarray:
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll) — matches geometry.so3.rpy_to_matrix
    (reference convention, Utils.cpp getTransformFromRPYT)."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    return np.asarray([
        [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
        [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
        [-sp, cp * sr, cp * cr]])


def _np_mat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), numerically safe."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.asarray([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                        (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    elif R[0, 0] >= R[1, 1] and R[0, 0] >= R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        q = np.asarray([(R[2, 1] - R[1, 2]) / s, 0.25 * s,
                        (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
    elif R[1, 1] >= R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        q = np.asarray([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                        0.25 * s, (R[1, 2] + R[2, 1]) / s])
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        q = np.asarray([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                        (R[1, 2] + R[2, 1]) / s, 0.25 * s])
    return q / np.linalg.norm(q)


def _np_quat_to_mat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q / np.linalg.norm(q)
    return np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _np_pose_interp(T0: np.ndarray, T1: np.ndarray, a: float) -> np.ndarray:
    """Slerp rotation + lerp translation (se3.pose_interp semantics)."""
    q0 = _np_mat_to_quat(T0[:3, :3])
    q1 = _np_mat_to_quat(T1[:3, :3])
    d = float(np.dot(q0, q1))
    if d < 0:
        q1, d = -q1, -d
    if d > 1 - 1e-6:
        q = q0 + a * (q1 - q0)
    else:
        th = np.arccos(np.clip(d, -1, 1))
        q = (np.sin((1 - a) * th) * q0 + np.sin(a * th) * q1) / np.sin(th)
    T = np.eye(4)
    T[:3, :3] = _np_quat_to_mat(q)
    T[:3, 3] = (1 - a) * T0[:3, 3] + a * T1[:3, 3]
    return T


def ins_fix_to_pose(fix: Dict, projector: UTMProjector) -> np.ndarray:
    """GPCHC-style fix dict -> 4x4 pose in the projector's metric frame.
    Heading is NED-clockwise degrees (reference convention)."""
    x, y = projector.project(fix["latitude"], fix["longitude"])
    z = fix.get("altitude", 0.0)
    yaw = np.deg2rad(90.0 - fix.get("heading", 0.0))  # NED heading -> ENU yaw
    pitch = np.deg2rad(fix.get("pitch", 0.0))
    roll = np.deg2rad(fix.get("roll", 0.0))
    T = np.eye(4)
    T[:3, :3] = _np_rpy_to_matrix(roll, pitch, yaw)
    T[:3, 3] = (float(np.ravel(x)[0]), float(np.ravel(y)[0]), float(z))
    return T


class InsMotionTracker:
    def __init__(self, buffer_s: float = 2.0):
        self.buffer_us = int(buffer_s * 1e6)
        self.fixes: Deque[Tuple[int, np.ndarray, Dict]] = deque()
        self.imu: Deque[np.ndarray] = deque()   # rows [ts_us, gx, gy, gz, ax, ay, az]
        self.projector = UTMProjector()
        self.last_trigger: Optional[Tuple[int, np.ndarray]] = None

    # feeding ------------------------------------------------------------
    def feed_fix(self, fix: Dict) -> None:
        ts = int(fix["timestamp"])
        T = ins_fix_to_pose(fix, self.projector)
        self.fixes.append((ts, T, fix))
        self._trim(ts)

    def feed_imu(self, ts_us: int, gyro, accel) -> None:
        self.imu.append(np.asarray([ts_us, *gyro, *accel], float))
        while self.imu and self.imu[0][0] < ts_us - self.buffer_us:
            self.imu.popleft()

    def _trim(self, now_us: int) -> None:
        while self.fixes and self.fixes[0][0] < now_us - self.buffer_us:
            self.fixes.popleft()

    # query --------------------------------------------------------------
    def pose_at(self, ts_us: int) -> Optional[np.ndarray]:
        if len(self.fixes) < 1:
            return None
        ts_arr = [f[0] for f in self.fixes]
        if ts_us <= ts_arr[0]:
            return self.fixes[0][1]
        if ts_us >= ts_arr[-1]:
            return self.fixes[-1][1]
        import bisect
        i = bisect.bisect_right(ts_arr, ts_us) - 1
        t0, T0, _ = self.fixes[i]
        t1, T1, _ = self.fixes[i + 1]
        a = (ts_us - t0) / max(t1 - t0, 1)
        return _np_pose_interp(T0, T1, float(a))

    def trigger(self, ts_us: int) -> Dict:
        """Per-frame query (ref trigger/getMotion): returns dict with
        pose (4x4 or None), motion (4x4 relative previous trigger, in the
        PREVIOUS body frame), motion_valid, imu (M, 7) window rows."""
        pose = self.pose_at(ts_us)
        motion = np.eye(4)
        motion_valid = False
        prev_ts = self.last_trigger[0] if self.last_trigger is not None else None
        if pose is not None and self.last_trigger is not None:
            t_prev, T_prev = self.last_trigger
            motion = np.linalg.inv(T_prev) @ pose
            motion_valid = True
        if pose is not None:
            self.last_trigger = (ts_us, pose.copy())
        # IMU window spans the frame interval (prev trigger -> now)
        t_lo = prev_ts if prev_ts is not None else ts_us - 200000
        window = [r for r in self.imu if t_lo <= r[0] <= ts_us]
        imu = np.stack(window) if window else np.zeros((0, 7))
        return dict(pose=pose, motion=motion, motion_valid=motion_valid, imu=imu)

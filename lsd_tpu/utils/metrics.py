"""Trajectory accuracy metrics.

``ate_rmse`` is the standard ATE: RMSE of positions after least-squares
SE3 alignment (Umeyama, no scale).  Single-pose alignment (anchoring both
trajectories at one index) injects that pose's own error plus a
heading-lever term into every other pose — at 100 m extents a 2 mrad
heading error at the anchor reads as ~0.2 m of fake ATE — so it is only
kept as an option for legacy comparisons.
"""
from __future__ import annotations

import numpy as np


def umeyama_align(P: np.ndarray, Q: np.ndarray):
    """Least-squares rigid transform (R, t) minimizing |R P + t - Q|."""
    mp, mq = P.mean(0), Q.mean(0)
    H = (P - mp).T @ (Q - mq)
    U, _S, Vt = np.linalg.svd(H)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ D @ U.T
    t = mq - R @ mp
    return R, t


def ate_rmse(est_T: np.ndarray, gt_T: np.ndarray, warmup: int = 0,
             align: str = "umeyama") -> float:
    """ATE RMSE of (N,4,4) pose arrays after alignment.

    align: "umeyama" (standard), "first" (single-pose at ``warmup``), or
    "none" (absolute error — meaningful for GNSS-anchored maps)."""
    n = min(len(est_T), len(gt_T))
    P = np.asarray(est_T)[warmup:n, :3, 3]
    Q = np.asarray(gt_T)[warmup:n, :3, 3]
    if align == "umeyama":
        R, t = umeyama_align(P, Q)
        err = np.linalg.norm(P @ R.T + t - Q, axis=1)
    elif align == "first":
        A = gt_T[warmup] @ np.linalg.inv(est_T[warmup])
        e = np.einsum("ij,njk->nik", A, np.asarray(est_T)[warmup:n])
        err = np.linalg.norm(e[:, :3, 3] - Q, axis=1)
    else:
        err = np.linalg.norm(P - Q, axis=1)
    return float(np.sqrt(np.mean(err ** 2)))

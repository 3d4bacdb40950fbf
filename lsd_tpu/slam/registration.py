"""Scan registration: point-to-plane ICP and NDT, jitted Gauss-Newton.

TPU-native equivalents of the reference's registration cores
(slam/thirdparty/fast_gicp + ndt_omp, selected in
slam/backend/registrations.cpp:35-134; used for loop-closure verification
in loop_detector.hpp and NDT map matching in hdl_localization):

- ``icp_point_to_plane``: align a source scan to a target VoxelHashMap with
  kNN plane fits (the GICP-class verifier).
- ``NdtMap`` + ``ndt_align``: per-voxel Gaussian stats and P2D-NDT
  Gauss-Newton alignment (the localization matcher).

Both optimize a 6-dof right-perturbation twist with fixed iteration counts
(static shapes; convergence is monitored via the returned fitness).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geometry import so3
from ..ops.hashmap import _probe_find, _slot_hash, _content_key, hashmap_knn
from ..ops.planefit import fit_planes
from ..utils.precision import mxu_f32


def _apply(q, t, pts):
    return so3.quat_rotate(q[None, :], pts) + t


# --------------------------------------------------------------------------
# point-to-plane ICP against a voxel hash map


@functools.partial(jax.jit,
                   static_argnames=("iters", "neighborhood", "searches",
                                    "min_points"))
@mxu_f32
def icp_point_to_plane(target, source: jax.Array, mask: jax.Array,
                       q0: jax.Array, t0: jax.Array, iters: int = 10,
                       plane_thresh: float = 0.2, max_dist: float = 1.0,
                       neighborhood: int = 19,
                       searches: Optional[int] = None,
                       min_points: int = 6
                       ) -> Tuple[jax.Array, jax.Array, dict]:
    """Refine (q0, t0) so that source points fit target planes.

    target: VoxelHashMap (kNN + 5-point plane fit) or SurfelMap (merged
    neighborhood moments — much cheaper lookups).

    The expensive plane SEARCH runs `searches` times (default: every
    iteration — exact classic ICP); between searches, `iters // searches`
    Gauss-Newton iterations re-linearize against the fixed plane set.
    Callers with tight priors (localization tracking) pass searches=1-2
    to amortize the dominant search cost; association is stable under
    mm-cm per-iteration motion (fast_gicp likewise caches
    correspondences).

    Returns (q, t, info) with info = dict(fitness=inlier fraction,
    mean_residual, last_delta).
    """
    searches = iters if searches is None else max(1, min(searches, iters))
    inner = max(1, iters // searches)

    def find_planes(q, t):
        pw = _apply(q, t, source)
        from ..ops.surfel import SurfelMap, surfel_match
        if isinstance(target, SurfelMap):
            normals, d, ok, _rms = surfel_match(target, pw, mask,
                                                plane_thresh,
                                                min_points=min_points)
        else:
            nbrs, nvalid = hashmap_knn(target, pw, mask, k=5,
                                       neighborhood=neighborhood)
            normals, d, ok = fit_planes(nbrs, nvalid, plane_thresh)
        return normals, d, ok

    def gn_step(carry, _):
        q, t, normals, d, ok = carry
        pw = _apply(q, t, source)
        r = jnp.einsum("ni,ni->n", pw, normals) + d
        valid = mask & ok & (jnp.abs(r) < max_dist)
        n_planes = jnp.sum((mask & ok).astype(source.dtype))
        w = valid.astype(source.dtype)
        # H rows: [dr/dtheta, dr/dt] with right-perturbed rotation
        nR = normals @ so3.quat_to_matrix(q)
        H = jnp.concatenate([-jnp.cross(nR, source), normals], axis=-1)  # (N, 6)
        H = H * w[:, None]
        rw = r * w
        A = H.T @ H
        # Levenberg damping + trust region: sparse scans leave near-null
        # directions (ground-only patches), and an undamped GN step runs
        # tens of meters along them (observed on 4k-pt scan-to-scan
        # alignment); damping relative to diag(A) keeps the conditioned
        # directions exact while bounding the null ones
        A = A + 1e-3 * jnp.diag(jnp.diagonal(A)) + 1e-6 * jnp.eye(6, dtype=source.dtype)
        b = H.T @ rw
        dx = -jnp.linalg.solve(A, b)
        rot_n = jnp.linalg.norm(dx[:3])
        t_n = jnp.linalg.norm(dx[3:])
        scale = jnp.minimum(1.0, jnp.minimum(
            0.3 / jnp.maximum(rot_n, 1e-9), 1.0 / jnp.maximum(t_n, 1e-9)))
        dx = dx * scale
        q_new = so3.quat_normalize(so3.quat_mul(q, so3.quat_from_rotvec(dx[:3])))
        t_new = t + dx[3:]
        stats = jnp.stack([jnp.sum(w), jnp.sum(jnp.abs(rw)),
                           jnp.linalg.norm(dx), n_planes])
        return (q_new, t_new, normals, d, ok), stats

    q, t = q0, t0
    stats = None
    for _ in range(searches):
        normals, d, ok = find_planes(q, t)
        (q, t, _, _, _), stats = jax.lax.scan(
            gn_step, (q, t, normals, d, ok), None, length=inner)
    # final-iterate Gauss-Newton normal matrix: the 6-dof constraint
    # stiffness of this alignment ([rot, trans] rows, world basis at the
    # source pose).  Directions the target geometry does not constrain
    # (sliding along a corridor, yaw on a ground-only patch) show up as
    # near-zero eigenvalues — callers derive per-axis edge information
    # from it (ref: hdl_graph_slam information_matrix_calculator idea,
    # done from the actual Hessian instead of a fitness heuristic).
    pw_f = _apply(q, t, source)
    r_f = jnp.einsum("ni,ni->n", pw_f, normals) + d
    valid_f = mask & ok & (jnp.abs(r_f) < max_dist)
    w_f = valid_f.astype(source.dtype)
    nR_f = normals @ so3.quat_to_matrix(q)
    H_f = jnp.concatenate([-jnp.cross(nR_f, source), normals], -1) * w_f[:, None]
    JtJ = H_f.T @ H_f

    n_valid = stats[-1, 0]
    n_total = jnp.maximum(jnp.sum(mask.astype(source.dtype)), 1.0)
    n_planes = stats[-1, 3]
    info = dict(fitness=n_valid / n_total,
                JtJ=JtJ,
                mean_residual=stats[-1, 1] / jnp.maximum(n_valid, 1.0),
                last_delta=stats[-1, 2],
                # coverage-independent quality: of the source points whose
                # neighborhood HAS a target plane, what fraction aligned?
                # (fitness mixes alignment with map coverage — a local
                # target map caps it at the overlap fraction)
                n_inliers=n_valid,
                inlier_ratio=n_valid / jnp.maximum(n_planes, 1.0),
                overlap=n_planes / n_total)
    return q, t, info


# --------------------------------------------------------------------------
# NDT


class NdtMap(NamedTuple):
    keys: jax.Array      # (C,) int32, -1 empty
    mean: jax.Array      # (C, 3)
    cov_inv: jax.Array   # (C, 3, 3) regularized inverse covariance
    counts: jax.Array    # (C,)
    voxel_size: jax.Array

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]


@functools.partial(jax.jit, static_argnames=("capacity",))
def ndt_build(points: jax.Array, mask: jax.Array, voxel_size: float,
              capacity: int = 2 ** 15) -> NdtMap:
    """Build per-voxel Gaussian statistics from a (masked) map cloud."""
    n = points.shape[0]
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    h0 = _slot_hash(coords, capacity)
    ck = _content_key(coords)

    # resolve slots with the same probing scheme as the hash map
    keys = jnp.full((capacity,), -1, jnp.int32)
    slot = jnp.full((n,), -1, jnp.int32)
    claim = jnp.full((capacity,), jnp.iinfo(jnp.int32).max, jnp.int32)
    for p in range(8):
        cand = (h0 + p) & (capacity - 1)
        need = mask & (slot < 0)
        existing = keys[cand]
        want = need & (existing < 0)
        claim = claim.at[jnp.where(want, cand, capacity - 1)].min(
            jnp.where(want, jnp.arange(n), jnp.iinfo(jnp.int32).max))
        won = want & (claim[cand] == jnp.arange(n))
        keys = keys.at[jnp.where(won, cand, capacity)].set(ck, mode="drop")
        # match against the UPDATED keys so same-round losers land in the
        # slot their sibling point just claimed (all points of a voxel share
        # ck and the same probe sequence)
        match = keys[cand] == ck
        slot = jnp.where(need & match, cand, slot)

    ok = mask & (slot >= 0)
    seg = jnp.where(ok, slot, capacity)
    ones = ok.astype(points.dtype)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=capacity + 1)[:capacity]
    s1 = jax.ops.segment_sum(points * ones[:, None], seg, num_segments=capacity + 1)[:capacity]
    s2 = jax.ops.segment_sum(points[:, :, None] * points[:, None, :] * ones[:, None, None],
                             seg, num_segments=capacity + 1)[:capacity]
    mean = s1 / jnp.maximum(cnt, 1.0)[:, None]
    cov = s2 / jnp.maximum(cnt, 1.0)[:, None, None] - mean[:, :, None] * mean[:, None, :]
    # Regularize like ndt_omp: floor covariance eigenvalues so thin (planar)
    # voxels keep a usable basin — without this a wall voxel has ~cm normal
    # stddev and any decimeter offset is >10 sigma, zeroing the score.
    cov = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))
    lam, V = jnp.linalg.eigh(cov)
    floor = jnp.maximum(1e-2 * lam[..., 2:3], (0.1 * voxel_size) ** 2)
    lam_c = jnp.maximum(lam, floor)
    cov_inv = jnp.einsum("nij,nj,nkj->nik", V, 1.0 / lam_c, V)
    good = cnt >= 4
    keys = jnp.where(good, keys, -1)  # only well-populated voxels participate
    return NdtMap(keys=keys, mean=mean, cov_inv=cov_inv,
                  counts=cnt.astype(jnp.int32),
                  voxel_size=jnp.asarray(voxel_size, jnp.float32))


@functools.partial(jax.jit, static_argnames=("iters", "searches"))
@mxu_f32
def ndt_align(m: NdtMap, source: jax.Array, mask: jax.Array,
              q0: jax.Array, t0: jax.Array, iters: int = 30,
              outlier_ratio: float = 0.55,
              searches: Optional[int] = None
              ) -> Tuple[jax.Array, jax.Array, dict]:
    """P2D-NDT: iterated Gauss-Newton ascent on the Gaussian-mixture score
    (Magnusson's d1/d2 form, as in ndt_omp).

    The voxel assignment is piecewise-constant, so only the smooth
    first-order surrogate H = sum w_i g_i g_i^T is used (the exact Hessian
    steps erratically through assignment changes).  Converges steadily from
    up-to-half-voxel offsets; use the LIO/UKF prediction as q0/t0.

    Like icp_point_to_plane, the expensive ASSOCIATION (hash probe +
    mean/cov gathers over every point) runs ``searches`` times (default:
    every iteration — exact classic NDT); between searches,
    ``iters // searches`` GN iterations re-linearize against the frozen
    voxel assignment.  Tracking callers (cm-scale prior motion per
    iteration, voxels 1 m) pass searches=3-5: the assignment is stable
    at that scale, and the probe/gather is the dominant cost of the step
    (BENCH r4 phase table: 25 ms of a 38 ms localization step).
    """
    searches = iters if searches is None else max(1, min(searches, iters))
    inner = max(1, iters // searches)
    # Magnusson mixture constants (ndt_omp computeDerivatives)
    res = m.voxel_size
    c1 = 10.0 * (1.0 - outlier_ratio)
    c2 = outlier_ratio / (res ** 3)
    d3 = -jnp.log(c2)
    d1 = -jnp.log(c1 + c2) - d3
    d2 = -2.0 * jnp.log((-jnp.log(c1 * jnp.exp(-0.5) + c2) - d3) / d1)

    cap = m.capacity

    def associate(q, t):
        """Probe + gather per-point voxel Gaussians (the expensive half)."""
        pw = _apply(q, t, source)
        coords = jnp.floor(pw / m.voxel_size).astype(jnp.int32)
        # low load factor: 3 probes cover essentially every voxel
        slot = _probe_find(m.keys, coords, cap, num_probes=3)
        ok = mask & (slot >= 0)
        sl = jnp.maximum(slot, 0)
        return m.mean[sl], m.cov_inv[sl], ok

    def gn_step(carry, _):
        q, t, mean_g, ci, ok = carry
        xi0 = jnp.zeros(6, source.dtype)

        def pw_fn(xi):
            qq = so3.quat_mul(q, so3.quat_from_rotvec(xi[:3]))
            return _apply(qq, t + xi[3:], source)

        J = jax.jacfwd(pw_fn)(xi0)                          # (N, 3, 6)
        pw = pw_fn(xi0)
        dxv = pw - mean_g
        md = jnp.einsum("ni,nij,nj->n", dxv, ci, dxv)
        e = jnp.exp(-0.5 * d2 * md)
        w = jnp.where(ok, jnp.abs(d1) * d2 * e, 0.0)
        gi = jnp.einsum("ni,nij,njk->nk", dxv, ci, J)       # (N, 6) per-point grads
        H = jnp.einsum("n,nk,nl->kl", w, gi, gi) + 1e-3 * jnp.eye(6, dtype=source.dtype)
        # analytic score gradient from the SAME gathered values (the
        # autodiff of a score fn would re-probe and re-gather everything):
        # ds_i/dxi = d1 * d2 * e_i * gi_i
        g = jnp.sum(jnp.where(ok, d1 * d2 * e, 0.0)[:, None] * gi, axis=0)
        # the score is a sum of positive Gaussian bumps (-d1 > 0): ASCEND it
        dx = jnp.clip(jnp.linalg.solve(H, g), -0.5, 0.5)
        q_new = so3.quat_normalize(so3.quat_mul(q, so3.quat_from_rotvec(dx[:3])))
        t_new = t + dx[3:]
        return (q_new, t_new, mean_g, ci, ok), \
            jnp.stack([jnp.sum(ok.astype(jnp.float32)), jnp.linalg.norm(dx)])

    q, t = q0, t0
    stats = None
    for _ in range(searches):
        mean_g, ci, ok = associate(q, t)
        (q, t, _, _, _), stats = jax.lax.scan(
            gn_step, (q, t, mean_g, ci, ok), None, length=inner)
    # final score at the converged pose (fresh association)
    mean_g, ci, ok = associate(q, t)
    pw_f = _apply(q, t, source)
    dxv_f = pw_f - mean_g
    md_f = jnp.einsum("ni,nij,nj->n", dxv_f, ci, dxv_f)
    score = jnp.sum(jnp.where(ok, -d1 * jnp.exp(-0.5 * d2 * md_f), 0.0))
    n_ok = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)
    info = dict(score=-score / n_ok, matched_frac=n_ok / jnp.maximum(
        jnp.sum(mask.astype(jnp.float32)), 1.0), last_delta=stats[-1, 1])
    return q, t, info


# --------------------------------------------------------------------------
# host convenience: align one raw cloud onto another


def align_clouds(source: "np.ndarray", target: "np.ndarray",
                 T0: "np.ndarray", voxel_size: float = 0.5,
                 iters: int = 15) -> "np.ndarray":
    """Point-to-plane ICP between two raw (N, 3) numpy clouds with an
    initial-guess 4x4; returns the refined 4x4 mapping source -> target
    frame.  Host wrapper used by the map editor's keyframe_align (the
    reference's slam.pointcloud_align, slam/src/slam_wrapper.cpp GICP
    align surface)."""
    import numpy as np
    from ..geometry import np_so3
    from ..ops.surfel import surfel_create, surfel_insert

    def pad(pts):
        cap = 1 << int(np.ceil(np.log2(max(len(pts), 2))))
        buf = np.zeros((cap, 3), np.float32)
        buf[:len(pts)] = pts[:, :3]
        msk = np.zeros(cap, bool)
        msk[:len(pts)] = True
        return jnp.asarray(buf), jnp.asarray(msk)

    TP, TM = pad(np.asarray(target, np.float32))
    SP, SM = pad(np.asarray(source, np.float32))
    cap = max(2 ** 14, 2 * int(TM.shape[0]))
    T0 = np.asarray(T0, float).reshape(4, 4)
    q = jnp.asarray(np_so3.matrix_to_quat(T0[:3, :3]), jnp.float32)
    t = jnp.asarray(T0[:3, 3], jnp.float32)
    # coarse-to-fine: single scans are sparse (~1 pt per fine voxel), so
    # a fine-only surfel map yields noise planes and ICP wanders; a 2x
    # coarse pass locks the bulk alignment first (min_points=4 accepts
    # the thin single-scan neighborhoods at both scales)
    for vox, it in ((2.0 * voxel_size, max(4, iters // 2)),
                    (voxel_size, iters)):
        m = surfel_create(capacity=cap, voxel_size=vox)
        m = surfel_insert(m, TP, TM)
        q, t, _ = icp_point_to_plane(m, SP, SM, q, t, iters=it,
                                     min_points=4)
    T = np.eye(4)
    T[:3, :3] = np_so3.quat_to_matrix(np.asarray(q))
    T[:3, 3] = np.asarray(t)
    return T

"""Surfel voxel map: per-voxel Gaussian moments, planes from statistics.

TPU-native redesign of the LIO local map (second generation — replaces the
raw-point VoxelHashMap in the hot path).  Instead of storing K raw points
per voxel and running 5-NN plane fits (ikd-tree semantics), each voxel
accumulates second-order moments; at query time the moments of the center
voxel and its 6 face neighbors are merged (parallel-axis translation) and
the plane is the smallest-eigenvector of the merged covariance — i.e. the
plane fitted to ALL neighborhood points, not just 5.  This is the
pre-computed-surfel idea of Surfel-LIO (PAPERS.md: "Surfel-LIO: Fast
LiDAR-Inertial Odometry with Pre-computed Surfels") mapped onto our
open-addressed hash layout:

- insert = scatter-add of 10 floats/point (no sorting, no per-slot ranks)
- query  = gather of (N, 7, 10) floats (6x less HBM traffic than raw-K
  points) + closed-form 3x3 eigen (no linalg calls)
- numerics: moments are kept relative to each voxel's center so f32 sums
  never see world-scale magnitudes.

Moment layout (C, 10): [n, sx, sy, sz, sxx, syy, szz, sxy, sxz, syz].
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hashmap import NUM_PROBES, _content_key, _slot_hash, _probe_find


class SurfelMap(NamedTuple):
    keys: jax.Array      # (C,) int32 content key, -1 empty
    coords: jax.Array    # (C, 3) int32 voxel coords (trim/export)
    moments: jax.Array   # (C, 10) f32, offsets relative to voxel center
    voxel_size: jax.Array

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]


def surfel_create(capacity: int = 2 ** 17, voxel_size: float = 0.5) -> SurfelMap:
    assert capacity & (capacity - 1) == 0
    return SurfelMap(
        keys=jnp.full((capacity,), -1, jnp.int32),
        coords=jnp.zeros((capacity, 3), jnp.int32),
        moments=jnp.zeros((capacity, 10), jnp.float32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
    )


@jax.jit
def surfel_insert(m: SurfelMap, points: jax.Array, mask: jax.Array) -> SurfelMap:
    """Scatter-add masked points (N, 3) into voxel moment accumulators."""
    n = points.shape[0]
    cap = m.capacity
    coords = jnp.floor(points / m.voxel_size).astype(jnp.int32)
    ck = _content_key(coords)
    h0 = _slot_hash(coords, cap)

    keys = m.keys
    slot = jnp.full((n,), -1, jnp.int32)
    claim = jnp.full((cap,), jnp.iinfo(jnp.int32).max, jnp.int32)
    coords_tbl = m.coords
    for p in range(NUM_PROBES):
        cand = (h0 + p) & (cap - 1)
        need = mask & (slot < 0)
        existing = keys[cand]
        want = need & (existing < 0)
        claim = claim.at[jnp.where(want, cand, cap - 1)].min(
            jnp.where(want, jnp.arange(n), jnp.iinfo(jnp.int32).max))
        won = want & (claim[cand] == jnp.arange(n))
        keys = keys.at[jnp.where(won, cand, cap)].set(ck, mode="drop")
        coords_tbl = coords_tbl.at[jnp.where(won, cand, cap)].set(coords, mode="drop")
        # same-round siblings of the winner match via the updated keys
        match = keys[cand] == ck
        slot = jnp.where(need & match, cand, slot)

    ok = mask & (slot >= 0)
    center = (coords.astype(jnp.float32) + 0.5) * m.voxel_size
    off = points - center                               # |off| <= voxel/2*sqrt3
    row = jnp.concatenate([
        jnp.ones((n, 1), jnp.float32),
        off,
        off ** 2,
        off[:, 0:1] * off[:, 1:2], off[:, 0:1] * off[:, 2:3],
        off[:, 1:2] * off[:, 2:3],
    ], axis=-1)
    sl = jnp.where(ok, slot, cap)
    moments = m.moments.at[sl].add(jnp.where(ok[:, None], row, 0.0), mode="drop")
    return m._replace(keys=keys, coords=coords_tbl, moments=moments)


@jax.jit
def surfel_trim(m: SurfelMap, center: jax.Array, radius: float) -> SurfelMap:
    vc = (m.coords.astype(jnp.float32) + 0.5) * m.voxel_size
    keep = jnp.all(jnp.abs(vc - center) <= radius, axis=-1) & (m.keys >= 0)
    return m._replace(keys=jnp.where(keep, m.keys, -1),
                      moments=jnp.where(keep[:, None], m.moments, 0.0))


def _smallest_eigvec_3x3(A: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched closed-form smallest eigenpair of symmetric (…,3,3).

    Returns (eigvec unit, lam_min, lam_mid).  Trigonometric Cardano for the
    eigenvalues; eigenvector from the cross product of two rows of
    (A - lam I) (picking the largest cross product for stability).
    """
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 ** 2 + b11 ** 2 + b22 ** 2 + 2.0 * (a01 ** 2 + a02 ** 2 + a12 ** 2)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-20))
    # det(B)/2 with B = (A - qI)/p
    detB = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detB / (2.0 * p ** 3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)   # smallest
    lam2 = q + 2.0 * p * jnp.cos(phi)                        # largest
    lam1 = 3.0 * q - lam0 - lam2

    # eigenvector for lam0: null space of (A - lam0 I)
    c0 = jnp.stack([a00 - lam0, a01, a02], axis=-1)
    c1 = jnp.stack([a01, a11 - lam0, a12], axis=-1)
    c2 = jnp.stack([a02, a12, a22 - lam0], axis=-1)
    v01 = jnp.cross(c0, c1)
    v02 = jnp.cross(c0, c2)
    v12 = jnp.cross(c1, c2)
    n01 = jnp.sum(v01 ** 2, -1, keepdims=True)
    n02 = jnp.sum(v02 ** 2, -1, keepdims=True)
    n12 = jnp.sum(v12 ** 2, -1, keepdims=True)
    v = jnp.where(n01 >= jnp.maximum(n02, n12), v01,
                  jnp.where(n02 >= n12, v02, v12))
    v = v / jnp.sqrt(jnp.maximum(jnp.sum(v ** 2, -1, keepdims=True), 1e-20))
    return v, lam0, lam1


# np (not jnp): a module-level jnp constant becomes a captured device buffer
# in every jitted user, costing a host round-trip per call on tunneled TPU
# backends (measured ~1 ms/call + degraded dispatch session-wide).
_FACE_OFFSETS = np.asarray([[0, 0, 0], [1, 0, 0], [-1, 0, 0],
                            [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
                           np.int32)


@functools.partial(jax.jit, static_argnames=("min_points", ))
def surfel_match(m: SurfelMap, queries: jax.Array, qmask: jax.Array,
                 plane_thresh: float = 0.1, min_points: int = 6
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Plane (normals, d, valid) per query from merged neighborhood moments.

    Plane is n.x + d = 0 in world coords; valid requires enough points and
    RMS plane thickness sqrt(lam0/count) < plane_thresh.
    """
    n = queries.shape[0]
    base = jnp.floor(queries / m.voxel_size).astype(jnp.int32)
    ncoords = base[:, None, :] + _FACE_OFFSETS[None, :, :]        # (N, 7, 3)
    slots = _probe_find(m.keys, ncoords, m.capacity)              # (N, 7)
    ok_slot = slots >= 0
    sl = jnp.maximum(slots, 0)
    mom = m.moments[sl] * ok_slot[..., None]                      # (N, 7, 10)

    # translate each neighbor's moments to the QUERY voxel center frame:
    # offset d = neighbor_center - query_center = face_offset * voxel
    d = _FACE_OFFSETS.astype(jnp.float32)[None, :, :] * m.voxel_size  # (1,7,3)
    cnt = mom[..., 0]
    s1 = mom[..., 1:4]
    # second moments matrix S2 (sxx syy szz sxy sxz syz)
    sxx, syy, szz = mom[..., 4], mom[..., 5], mom[..., 6]
    sxy, sxz, syz = mom[..., 7], mom[..., 8], mom[..., 9]
    # S2' = S2 + d s1^T + s1 d^T + n d d^T  (per component)
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    s1x, s1y, s1z = s1[..., 0], s1[..., 1], s1[..., 2]
    sxx = sxx + 2 * dx * s1x + cnt * dx * dx
    syy = syy + 2 * dy * s1y + cnt * dy * dy
    szz = szz + 2 * dz * s1z + cnt * dz * dz
    sxy = sxy + dx * s1y + dy * s1x + cnt * dx * dy
    sxz = sxz + dx * s1z + dz * s1x + cnt * dx * dz
    syz = syz + dy * s1z + dz * s1y + cnt * dy * dz
    s1 = s1 + cnt[..., None] * d

    # merge the 7 neighbors
    N_ = jnp.sum(cnt, axis=1)
    S1 = jnp.sum(s1, axis=1)
    Sxx = jnp.sum(sxx, axis=1)
    Syy = jnp.sum(syy, axis=1)
    Szz = jnp.sum(szz, axis=1)
    Sxy = jnp.sum(sxy, axis=1)
    Sxz = jnp.sum(sxz, axis=1)
    Syz = jnp.sum(syz, axis=1)

    Nc = jnp.maximum(N_, 1.0)
    mean = S1 / Nc[:, None]
    cov = jnp.stack([
        jnp.stack([Sxx / Nc - mean[:, 0] ** 2, Sxy / Nc - mean[:, 0] * mean[:, 1],
                   Sxz / Nc - mean[:, 0] * mean[:, 2]], -1),
        jnp.stack([Sxy / Nc - mean[:, 0] * mean[:, 1], Syy / Nc - mean[:, 1] ** 2,
                   Syz / Nc - mean[:, 1] * mean[:, 2]], -1),
        jnp.stack([Sxz / Nc - mean[:, 0] * mean[:, 2], Syz / Nc - mean[:, 1] * mean[:, 2],
                   Szz / Nc - mean[:, 2] ** 2], -1),
    ], -2)

    normal, lam0, lam1 = _smallest_eigvec_3x3(cov)
    # plane in world coords: mean is relative to query voxel center
    center = (base.astype(jnp.float32) + 0.5) * m.voxel_size
    mean_w = mean + center
    dpl = -jnp.einsum("ni,ni->n", normal, mean_w)

    rms = jnp.sqrt(jnp.maximum(lam0, 0.0))
    valid = qmask & (N_ >= min_points) & (rms < plane_thresh) & \
        (lam1 > 4.0 * jnp.maximum(lam0, 1e-9)) & jnp.all(jnp.isfinite(normal), -1)
    normal = jnp.where(valid[:, None], normal, 0.0)
    dpl = jnp.where(valid, dpl, 0.0)
    return normal, dpl, valid, jnp.where(valid, rms, 0.0)

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

Moment layout: 10 independent (C,) planes [n, sx, sy, sz, sxx, syy, szz,
sxy, sxz, syz] (struct-of-arrays for fast scatter; see SurfelMap).)
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hashmap import _content_key, _slot_hash, _probe_find


class SurfelMap(NamedTuple):
    keys: jax.Array      # (C,) int32 content key, -1 empty
    coords: Tuple[jax.Array, ...]   # 3 independent (C,) int32 voxel coord
                         # planes (SoA, same scatter fast path as moments)
    moments: Tuple[jax.Array, ...]   # 10 independent (C,) f32 planes —
                         # true struct-of-arrays: scatter/gather run as 10
                         # fused SCALAR ops (measured ~7x faster on TPU
                         # than one (C, 10) row scatter, which XLA
                         # serializes; slices of a single (10, C) array do
                         # NOT hit the fast path)
    voxel_size: jax.Array

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]


def surfel_create(capacity: int = 2 ** 17, voxel_size: float = 0.5) -> SurfelMap:
    assert capacity & (capacity - 1) == 0
    return SurfelMap(
        keys=jnp.full((capacity,), -1, jnp.int32),
        coords=tuple(jnp.zeros((capacity,), jnp.int32) for _ in range(3)),
        moments=tuple(jnp.zeros((capacity,), jnp.float32)
                      for _ in range(10)),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
    )


_ALLOC_ROUNDS = 2
# probe window shared by insert (allocation candidates) and match
# (lookup): the surfel table runs at low load factor, so 2 slots cover
# essentially every voxel while slashing probe-gather volume (the
# dominant LIO cost); keep map_capacity >= 4x expected voxels
SURFEL_PROBES = 2


@jax.jit
def surfel_insert(m: SurfelMap, points: jax.Array, mask: jax.Array) -> SurfelMap:
    """Scatter-add masked points (N, 3) into voxel moment accumulators.

    Probing is vectorized: ONE gather reads all SURFEL_PROBES candidate keys
    per point, vector ops pick the existing slot or the first empty
    candidate, and only _ALLOC_ROUNDS claim/verify rounds run (each a
    scalar scatter-min + gather) — at the map's low load factor nearly
    every allocation wins in round 1, vs the previous 8-round sequential
    probe loop whose gathers/scatters dominated the whole LIO step.
    """
    n = points.shape[0]
    cap = m.capacity
    coords = jnp.floor(points / m.voxel_size).astype(jnp.int32)
    ck = _content_key(coords)
    h0 = _slot_hash(coords, cap)
    cand = (h0[:, None] + np.arange(SURFEL_PROBES, dtype=np.int32)) & (cap - 1)

    keys = m.keys
    coords_tbl = m.coords
    slot = jnp.full((n,), -1, jnp.int32)
    claim = jnp.full((cap,), jnp.iinfo(jnp.int32).max, jnp.int32)
    idx = jnp.arange(n)
    big = jnp.int32(SURFEL_PROBES + 1)
    for _ in range(_ALLOC_ROUNDS):
        kc = keys[cand]                                   # (N, P) one gather
        is_match = kc == ck[:, None]
        match_pos = jnp.min(jnp.where(is_match, np.arange(SURFEL_PROBES), big), 1)
        found = match_pos < SURFEL_PROBES
        slot = jnp.where((slot < 0) & found,
                         jnp.take_along_axis(
                             cand, jnp.minimum(match_pos, SURFEL_PROBES - 1)[:, None],
                             axis=1)[:, 0], slot)
        # allocate: first empty candidate for still-unresolved points
        empty_pos = jnp.min(jnp.where(kc < 0, np.arange(SURFEL_PROBES), big), 1)
        need = mask & (slot < 0) & (empty_pos < SURFEL_PROBES)
        tgt = jnp.take_along_axis(
            cand, jnp.minimum(empty_pos, SURFEL_PROBES - 1)[:, None], axis=1)[:, 0]
        claim = claim.at[jnp.where(need, tgt, cap - 1)].min(
            jnp.where(need, idx, jnp.iinfo(jnp.int32).max))
        won = need & (claim[tgt] == idx)
        wtgt = jnp.where(won, tgt, cap)
        keys = keys.at[wtgt].set(ck, mode="drop")
        coords_tbl = tuple(
            coords_tbl[a].at[wtgt].set(coords[:, a], mode="drop")
            for a in range(3))
        slot = jnp.where(won, tgt, slot)
        # losers (claim lost or key collision) resolve in the next round
        # through the refreshed keys gather

    ok = mask & (slot >= 0)
    center = (coords.astype(jnp.float32) + 0.5) * m.voxel_size
    off = points - center                               # |off| <= voxel/2*sqrt3
    comps = (jnp.ones((n,), jnp.float32),
             off[:, 0], off[:, 1], off[:, 2],
             off[:, 0] ** 2, off[:, 1] ** 2, off[:, 2] ** 2,
             off[:, 0] * off[:, 1], off[:, 0] * off[:, 2],
             off[:, 1] * off[:, 2])
    sl = jnp.where(ok, slot, cap)
    okf = ok.astype(jnp.float32)
    # 10 independent scalar scatter-adds (XLA fuses them into one fast
    # pass; a single (C, 10) row scatter is ~7x slower on TPU)
    moments = tuple(m.moments[k].at[sl].add(comps[k] * okf, mode="drop")
                    for k in range(10))
    return m._replace(keys=keys, coords=coords_tbl, moments=moments)


@jax.jit
def surfel_trim(m: SurfelMap, center: jax.Array, radius: float) -> SurfelMap:
    keep = m.keys >= 0
    for a in range(3):
        vc = (m.coords[a].astype(jnp.float32) + 0.5) * m.voxel_size
        keep = keep & (jnp.abs(vc - center[a]) <= radius)
    return m._replace(keys=jnp.where(keep, m.keys, -1),
                      moments=tuple(jnp.where(keep, mk, 0.0)
                                    for mk in m.moments))


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


def surfel_neighborhood_moments(m: SurfelMap, queries: jax.Array,
                                neighbor_mask: jax.Array = None
                                ) -> jax.Array:
    """Summed neighborhood moments (N, 10) in each query's voxel-center
    frame.  ``neighbor_mask`` (N, 7) optionally drops neighbors (used by
    the sharded map: each device sums only the voxels it OWNS; moments are
    additive, so a psum over device partials is exactly the full-map
    merge)."""
    base = jnp.floor(queries / m.voxel_size).astype(jnp.int32)
    ncoords = base[:, None, :] + _FACE_OFFSETS[None, :, :]        # (N, 7, 3)
    # low load factor: 2 probes find essentially every occupied slot and
    # halve the dominant key-gather volume
    slots = _probe_find(m.keys, ncoords, m.capacity,
                        num_probes=SURFEL_PROBES)  # (N, 7)
    ok_slot = slots >= 0
    if neighbor_mask is not None:
        ok_slot = ok_slot & neighbor_mask
    sl = jnp.maximum(slots, 0)
    # gathers prefer rows (AoS): materialize (C, 10) once (~10 MB copy,
    # cheap) then one row gather — measured ~2x faster than 10 scalar
    # gathers at (N, 7) indices, while inserts keep the SoA fast path
    tbl = jnp.stack(m.moments, axis=-1)
    mom = tbl[sl] * ok_slot[..., None].astype(jnp.float32)

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
    merged = jnp.stack([
        jnp.sum(cnt, axis=1),
        jnp.sum(s1[..., 0], axis=1),
        jnp.sum(s1[..., 1], axis=1),
        jnp.sum(s1[..., 2], axis=1),
        jnp.sum(sxx, axis=1), jnp.sum(syy, axis=1), jnp.sum(szz, axis=1),
        jnp.sum(sxy, axis=1), jnp.sum(sxz, axis=1), jnp.sum(syz, axis=1),
    ], axis=-1)
    return merged


def planes_from_moments(merged: jax.Array, queries: jax.Array,
                        voxel_size, qmask: jax.Array,
                        plane_thresh: float = 0.1, min_points: int = 6
                        ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Plane extraction from summed neighborhood moments (N, 10)."""
    base = jnp.floor(queries / voxel_size).astype(jnp.int32)
    N_ = merged[..., 0]
    S1 = merged[..., 1:4]
    Sxx, Syy, Szz = merged[..., 4], merged[..., 5], merged[..., 6]
    Sxy, Sxz, Syz = merged[..., 7], merged[..., 8], merged[..., 9]

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
    center = (base.astype(jnp.float32) + 0.5) * voxel_size
    mean_w = mean + center
    dpl = -jnp.einsum("ni,ni->n", normal, mean_w)

    rms = jnp.sqrt(jnp.maximum(lam0, 0.0))
    valid = qmask & (N_ >= min_points) & (rms < plane_thresh) & \
        (lam1 > 4.0 * jnp.maximum(lam0, 1e-9)) & jnp.all(jnp.isfinite(normal), -1)
    normal = jnp.where(valid[:, None], normal, 0.0)
    dpl = jnp.where(valid, dpl, 0.0)
    return normal, dpl, valid, jnp.where(valid, rms, 0.0)


@functools.partial(jax.jit, static_argnames=("min_points", ))
def surfel_match(m: SurfelMap, queries: jax.Array, qmask: jax.Array,
                 plane_thresh: float = 0.1, min_points: int = 6
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Plane (normals, d, valid) per query from merged neighborhood moments.

    Plane is n.x + d = 0 in world coords; valid requires enough points and
    RMS plane thickness sqrt(lam0/count) < plane_thresh.
    """
    merged = surfel_neighborhood_moments(m, queries)
    return planes_from_moments(merged, queries, m.voxel_size, qmask,
                               plane_thresh, min_points)

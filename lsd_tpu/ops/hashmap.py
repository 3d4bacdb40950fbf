"""Fixed-capacity voxel hash map — the LIO local map.

TPU-native replacement for the reference's incremental kNN structures
(slam/mapping/fastlio/ikd-Tree/ikd_Tree.cpp and ivox3d/ivox3d.h).  An
ikd-tree is pointer-chasing and unportable to XLA; instead we keep an
open-addressed hash table of voxels, each holding up to K map points, as a
structure-of-arrays PyTree.  All operations are static-shape, functional
(return a new map), and jit/vmap-friendly:

- ``hashmap_insert``  — batch insert a (masked) downsampled scan
- ``hashmap_knn``     — for each query point, gather candidates from the
                        neighbor voxels and return the k nearest
- ``hashmap_trim``    — drop voxels outside a box around the sensor
                        (ref: lasermap_fov_segment, laserMapping.cpp:242-286)

Design notes (performance):
- Slot index and stored content key use *independent* hashes, so probing
  needs a single int32 gather+compare per probe round instead of a 3-wide
  coords comparison.  A false voxel identity needs a simultaneous
  collision of both 30-bit hashes within one probe window (~2^-30/pair) —
  harmless for mapping (two far-apart voxels would pool points).
- Batch slot allocation races are resolved with scatter-min claim rounds.
- Voxels whose K-point buffer is full reject further points (FAST-LIO
  similarly stops map growth inside dense voxels).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NUM_PROBES = 8
import numpy as np


def _fmix32(h: jax.Array) -> jax.Array:
    """murmur3 finalizer (uint32) — strong avalanche, vectorizes on the VPU."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _hash_coords(coords: jax.Array, seed: int) -> jax.Array:
    """Mix integer voxel coords (..., 3) into a well-distributed uint32.

    A plain XOR-of-prime-products spatial hash collides exactly for
    sign-symmetric coords (two's-complement negation ~ bitwise NOT under
    XOR), which real point clouds hit constantly — hence the murmur chain.
    """
    c = coords.astype(jnp.uint32)
    h = _fmix32(c[..., 0] ^ jnp.uint32(seed))
    h = _fmix32(h ^ c[..., 1])
    h = _fmix32(h ^ c[..., 2])
    return h


class VoxelHashMap(NamedTuple):
    keys: jax.Array      # (C,) int32 content key, -1 = empty
    coords: jax.Array    # (C, 3) int32 voxel integer coords (for trim/export)
    points: jax.Array    # (C, K, 3) f32 stored points (map frame)
    counts: jax.Array    # (C,) int32 valid points per voxel
    voxel_size: jax.Array  # () f32

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def points_per_voxel(self) -> int:
        return self.points.shape[1]


def hashmap_create(capacity: int = 2 ** 17, points_per_voxel: int = 8,
                   voxel_size: float = 0.5) -> VoxelHashMap:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return VoxelHashMap(
        keys=jnp.full((capacity,), -1, jnp.int32),
        coords=jnp.zeros((capacity, 3), jnp.int32),
        points=jnp.zeros((capacity, points_per_voxel, 3), jnp.float32),
        counts=jnp.zeros((capacity,), jnp.int32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
    )


def _slot_hash(coords: jax.Array, capacity: int) -> jax.Array:
    return (_hash_coords(coords, 0x9E3779B9) & jnp.uint32(capacity - 1)).astype(jnp.int32)


def _content_key(coords: jax.Array) -> jax.Array:
    # non-negative int32; -1 stays "empty"
    return (_hash_coords(coords, 0x85EBCA77) & jnp.uint32(0x3FFFFFFF)).astype(jnp.int32)


def _probe_find(keys: jax.Array, coords: jax.Array, capacity: int,
                num_probes: int = NUM_PROBES) -> jax.Array:
    """Find existing slot for voxel coords (..., 3); -1 if absent.

    num_probes can be lowered by callers whose tables run at low load
    factor (e.g. the surfel map): probe gathers are the dominant cost of
    a lookup and nearly all hits land in the first couple of slots."""
    h0 = _slot_hash(coords, capacity)
    ck = _content_key(coords)
    found = jnp.full(h0.shape, -1, jnp.int32)
    for p in range(num_probes):
        slot = (h0 + p) & (capacity - 1)
        match = keys[slot] == ck
        found = jnp.where((found < 0) & match, slot, found)
    return found


@jax.jit
def hashmap_insert(m: VoxelHashMap, points: jax.Array, mask: jax.Array) -> VoxelHashMap:
    """Insert masked points (N, 3) into the map."""
    n = points.shape[0]
    cap = m.capacity
    K = m.points_per_voxel
    coords = jnp.floor(points / m.voxel_size).astype(jnp.int32)
    ck = _content_key(coords)

    # --- sort by voxel, find unique representatives ---
    sort_key = jnp.where(mask, (coords[:, 0] * 2048 + coords[:, 1]) * 2048 + coords[:, 2],
                         jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(sort_key)
    coords_s, pts_s, mask_s = coords[order], points[order], mask[order]
    ck_s = ck[order]
    sk_s = sort_key[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sk_s[1:] != sk_s[:-1]]) & mask_s
    uid = jnp.cumsum(first) - 1                      # unique voxel id per point
    rank = jnp.arange(n) - jnp.maximum(jax.lax.cummax(jnp.where(first, jnp.arange(n), -1)), 0)

    # --- allocate/find a slot per unique voxel (race-free via scatter-min) ---
    h0 = _slot_hash(coords_s, cap)
    slot = jnp.full((n,), -1, jnp.int32)
    keys = m.keys
    coords_tbl = m.coords
    claim_tbl = jnp.full((cap,), jnp.iinfo(jnp.int32).max, jnp.int32)
    for p in range(NUM_PROBES):
        cand = (h0 + p) & (cap - 1)
        need = first & (slot < 0)
        existing = keys[cand]
        match = existing == ck_s
        slot = jnp.where(need & match, cand, slot)
        # claim empty candidate slots; min point-index wins the race
        want = need & (existing < 0)
        claim_tbl = claim_tbl.at[jnp.where(want, cand, cap - 1)].min(
            jnp.where(want, jnp.arange(n), jnp.iinfo(jnp.int32).max))
        won = want & (claim_tbl[cand] == jnp.arange(n))
        slot = jnp.where(won, cand, slot)
        keys = keys.at[jnp.where(won, cand, cap)].set(ck_s, mode="drop")
        coords_tbl = coords_tbl.at[jnp.where(won, cand, cap)].set(coords_s, mode="drop")
        # stale claim_tbl entries only refer to slots that just became
        # occupied (every claimed empty slot gets exactly one winner), so no
        # reset between rounds is needed.

    # broadcast unique-representative slot to all points of the voxel
    rep_slot = jax.ops.segment_max(jnp.where(first, slot, -1), uid, num_segments=n)
    pslot = rep_slot[uid]
    ok = mask_s & (pslot >= 0)

    # --- append points, bounded by per-voxel capacity K ---
    base = m.counts[jnp.maximum(pslot, 0)]
    pos = base + rank
    ok = ok & (pos < K)
    flat = jnp.where(ok, pslot * K + pos, cap * K)
    new_pts = m.points.reshape(cap * K, 3)
    new_pts = new_pts.at[flat].set(pts_s, mode="drop").reshape(cap, K, 3)
    added = jax.ops.segment_sum(ok.astype(jnp.int32), jnp.where(ok, pslot, cap),
                                num_segments=cap + 1)[:cap]
    return m._replace(keys=keys, coords=coords_tbl, points=new_pts,
                      counts=m.counts + added)


@jax.jit
def hashmap_trim(m: VoxelHashMap, center: jax.Array, radius: float) -> VoxelHashMap:
    """Free voxels outside an axis-aligned box of half-width ``radius``."""
    vc = (m.coords.astype(jnp.float32) + 0.5) * m.voxel_size
    keep = jnp.all(jnp.abs(vc - center) <= radius, axis=-1) & (m.keys >= 0)
    return m._replace(keys=jnp.where(keep, m.keys, -1),
                      counts=jnp.where(keep, m.counts, 0))


def _neighbor_offsets(neighborhood: int) -> jnp.ndarray:
    full = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
    if neighborhood == 27:
        offs = full
    elif neighborhood == 19:   # center + 6 faces + 12 edges (no corners)
        offs = [o for o in full if abs(o[0]) + abs(o[1]) + abs(o[2]) <= 2]
    elif neighborhood == 7:    # center + 6 faces
        offs = [o for o in full if abs(o[0]) + abs(o[1]) + abs(o[2]) <= 1]
    else:
        raise ValueError(f"neighborhood must be 7, 19 or 27, got {neighborhood}")
    # np (not jnp): called at trace time inside hashmap_knn — a jnp array
    # here becomes a captured device buffer (host round-trip per call on
    # tunneled TPU backends); an np array lowers as an inline literal.
    return np.asarray(offs, np.int32)


@functools.partial(jax.jit, static_argnames=("k", "neighborhood"))
def hashmap_knn(m: VoxelHashMap, queries: jax.Array, qmask: jax.Array, k: int = 5,
                neighborhood: int = 19) -> Tuple[jax.Array, jax.Array]:
    """k nearest map points for each query (N, 3) from the neighbor voxels.
    Returns (neighbors (N, k, 3), valid (N, k))."""
    n = queries.shape[0]
    K = m.points_per_voxel
    base = jnp.floor(queries / m.voxel_size).astype(jnp.int32)

    offsets = _neighbor_offsets(neighborhood)
    nb = offsets.shape[0]
    ncoords = base[:, None, :] + offsets[None, :, :]             # (N, nb, 3)
    slots = _probe_find(m.keys, ncoords, m.capacity)             # (N, nb)
    valid_slot = slots >= 0
    sl = jnp.maximum(slots, 0)
    cand = m.points[sl]                                          # (N, nb, K, 3)
    ccnt = m.counts[sl]                                          # (N, nb)
    cmask = (jnp.arange(K)[None, None, :] < ccnt[:, :, None]) & valid_slot[:, :, None]

    cand = cand.reshape(n, nb * K, 3)
    cmask = cmask.reshape(n, nb * K)
    d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cmask, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)                              # (N, k)
    nbrs = jnp.take_along_axis(cand, idx[:, :, None], axis=1)
    valid = jnp.isfinite(-neg) & qmask[:, None]
    return nbrs, valid

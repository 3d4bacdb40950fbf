"""ScanContext place recognition — polar BEV descriptors, MXU-friendly.

Re-derivation of the reference's ScanContext relocalization path
(slam/common/Scancontext/Scancontext.cpp + its nanoflann ring-key KD-tree,
used by slam/localization/src/global_localization.cpp): each scan becomes a
(rings x sectors) max-height image in polar BEV; a rotation-invariant
"ring key" (per-ring occupancy mean) prunes candidates; the full descriptor
distance is the best column-shifted cosine distance, which also yields a
yaw estimate.

TPU design: the database is a fixed-capacity array; candidate search and
the shift-search are batched matmuls/reductions over the whole DB — no
KD-tree needed at these sizes (thousands of keyframes), and it all rides
the MXU.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NUM_RING = 20
NUM_SECTOR = 60
MAX_RADIUS = 80.0


class ScanContextDB(NamedTuple):
    desc: jax.Array      # (C, R, S)
    ring_key: jax.Array  # (C, R)
    count: jax.Array     # () int32
    mask: jax.Array      # (C,)

    @property
    def capacity(self) -> int:
        return self.desc.shape[0]


def sc_db_create(capacity: int = 4096, rings: int = NUM_RING,
                 sectors: int = NUM_SECTOR) -> ScanContextDB:
    return ScanContextDB(
        desc=jnp.zeros((capacity, rings, sectors), jnp.float32),
        ring_key=jnp.zeros((capacity, rings), jnp.float32),
        count=jnp.asarray(0, jnp.int32),
        mask=jnp.zeros((capacity,), bool),
    )


@functools.partial(jax.jit, static_argnames=("rings", "sectors"))
def make_descriptor(points: jax.Array, mask: jax.Array,
                    rings: int = NUM_RING, sectors: int = NUM_SECTOR,
                    max_radius: float = MAX_RADIUS) -> jax.Array:
    """Polar BEV max-height descriptor (rings, sectors).

    Heights are shifted by +2 m like the reference (lidar above ground) so
    ground returns produce positive cells.
    """
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(y, x) + jnp.pi
    ring = jnp.clip((r / max_radius * rings).astype(jnp.int32), 0, rings - 1)
    sector = jnp.clip((theta / (2 * jnp.pi) * sectors).astype(jnp.int32), 0, sectors - 1)
    ok = mask & (r < max_radius)
    flat = jnp.where(ok, ring * sectors + sector, rings * sectors)
    desc = jnp.zeros((rings * sectors + 1,), points.dtype)
    desc = desc.at[flat].max(jnp.where(ok, z + 2.0, -jnp.inf))
    desc = jnp.maximum(desc[:-1], 0.0)
    return desc.reshape(rings, sectors)


def ring_key(desc: jax.Array) -> jax.Array:
    """Rotation-invariant per-ring occupancy mean."""
    return jnp.mean((desc > 0).astype(desc.dtype), axis=-1)


@jax.jit
def sc_db_add_batch(db: ScanContextDB, descs: jax.Array,
                    mask: jax.Array) -> ScanContextDB:
    """Append K descriptors in ONE dispatch (map load path: the reference
    map_loader rebuilds the whole ScanContext DB at startup —
    localization.cpp/map_loader.cpp; a per-keyframe python loop costs one
    jit dispatch per keyframe and recompiles per padding bucket)."""
    k = descs.shape[0]
    pos = db.count + jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask, pos % db.capacity, db.capacity)
    rk = jax.vmap(ring_key)(descs)
    return db._replace(
        desc=db.desc.at[tgt].set(descs, mode="drop"),
        ring_key=db.ring_key.at[tgt].set(rk, mode="drop"),
        count=db.count + jnp.sum(mask.astype(jnp.int32)),
        mask=db.mask.at[tgt].set(True, mode="drop"))


@jax.jit
def sc_db_add(db: ScanContextDB, desc: jax.Array) -> ScanContextDB:
    i = db.count % db.capacity
    return db._replace(desc=db.desc.at[i].set(desc),
                       ring_key=db.ring_key.at[i].set(ring_key(desc)),
                       count=db.count + 1,
                       mask=db.mask.at[i].set(True))


def _shifted_distance(q: jax.Array, d: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Min-over-shifts cosine distance between descriptors + best shift.

    q (R, S); d (..., R, S).  Columns are compared with cosine similarity,
    averaged over non-empty columns (reference distDirectSC).
    """
    S = q.shape[-1]
    shifts = jnp.arange(S)
    # roll q by every shift: (S, R, S)
    qs = jax.vmap(lambda s: jnp.roll(q, s, axis=-1))(shifts)

    def dist_one(dd):
        # (S_shift, R, S) x (R, S) column-wise cosine
        num = jnp.einsum("krs,rs->ks", qs, dd)
        qn = jnp.linalg.norm(qs, axis=1)                      # (S, S)
        dn = jnp.linalg.norm(dd, axis=0)                      # (S,)
        valid = (qn > 1e-6) & (dn[None, :] > 1e-6)
        cos = jnp.where(valid, num / jnp.maximum(qn * dn[None, :], 1e-9), 0.0)
        ncol = jnp.maximum(jnp.sum(valid, axis=-1), 1)
        d_shift = 1.0 - jnp.sum(cos, axis=-1) / ncol          # (S,)
        best = jnp.argmin(d_shift)
        return d_shift[best], best

    return dist_one(d) if d.ndim == 2 else jax.vmap(dist_one)(d)


@functools.partial(jax.jit, static_argnames=("num_candidates",))
def sc_query(db: ScanContextDB, desc: jax.Array, num_candidates: int = 10,
             exclude_recent: int = 50) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Find the best match in the DB for ``desc``.

    Returns (best_index, distance, yaw_rad).  best_index is -1-able only by
    the caller thresholding ``distance``; recent ``exclude_recent`` entries
    are skipped (they are trivially similar — same spot).
    """
    qk = ring_key(desc)
    dk = jnp.linalg.norm(db.ring_key - qk[None, :], axis=-1)
    recent = (jnp.arange(db.capacity) >= (db.count - exclude_recent))
    dk = jnp.where(db.mask & ~recent, dk, jnp.inf)
    _, cand = jax.lax.top_k(-dk, num_candidates)

    dists, shifts = _shifted_distance(desc, db.desc[cand])
    dists = jnp.where(jnp.isfinite(dk[cand]), dists, jnp.inf)
    b = jnp.argmin(dists)
    best_idx = jnp.where(jnp.isfinite(dists[b]), cand[b], -1)
    yaw = shifts[b].astype(jnp.float32) / db.desc.shape[-1] * 2 * jnp.pi
    # shifts > half-circle mean negative yaw
    yaw = jnp.where(yaw > jnp.pi, yaw - 2 * jnp.pi, yaw)
    return best_idx, dists[b], yaw

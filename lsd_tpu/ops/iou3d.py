"""Rotated 3D box IoU / GIoU and BEV NMS — vectorized JAX.

TPU-native replacement for the reference's CUDA kernels
(sensor_driver/inference/iou3d_nms/src/iou3d_nms_kernel.cpp(.cu) +
iou3d_cpu.cpp): rotated-rectangle overlap via Sutherland-Hodgman polygon
clipping, batched as pure tensor ops (no data-dependent loops — every box
pair is processed with fixed-size polygon buffers and masks).

Boxes are (x, y, z, dx, dy, dz, heading) like the reference (OpenPCDet
convention, heading about +z).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _box_corners_bev(boxes: jax.Array) -> jax.Array:
    """(..., 7) -> (..., 4, 2) BEV corners, CCW."""
    x, y = boxes[..., 0], boxes[..., 1]
    dx, dy, r = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    c, s = jnp.cos(r), jnp.sin(r)
    lx = jnp.stack([dx, dx, -dx, -dx], axis=-1) * 0.5
    ly = jnp.stack([-dy, dy, dy, -dy], axis=-1) * 0.5
    cx = x[..., None] + lx * c[..., None] - ly * s[..., None]
    cy = y[..., None] + lx * s[..., None] + ly * c[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _polygon_area(poly: jax.Array, mask: jax.Array) -> jax.Array:
    """Shoelace area of a masked polygon (..., V, 2) with valid-vertex mask.

    Vertices must be ordered; masked slots must duplicate the last valid
    vertex (we guarantee this in _clip)."""
    nxt = jnp.roll(poly, -1, axis=-2)
    cross = poly[..., 0] * nxt[..., 1] - nxt[..., 0] * poly[..., 1]
    return 0.5 * jnp.abs(jnp.sum(cross * mask, axis=-1))


def _clip_poly_halfplane(poly, pmask, a, b):
    """Clip polygon by half-plane (points p with cross(b-a, p-a) >= 0 kept).

    poly: (V, 2) with pmask (V,) — fixed buffer V=16; output same size.
    Sutherland-Hodgman with static buffers: for each edge (p, q) of the
    input polygon emit up to 2 vertices into fixed slots (2 per input
    vertex), then compact by validity mask ordering preserved via cumsum
    positions.
    """
    V = poly.shape[0]
    d = b - a
    side = d[0] * (poly[:, 1] - a[1]) - d[1] * (poly[:, 0] - a[0])
    inside = (side >= 0) & pmask

    # next valid vertex with wrap-around: valid vertices are compacted at
    # the front, so "next of the last valid" is index 0 (a plain roll would
    # step into padding and drop the closing edge)
    cnt_in = jnp.sum(pmask.astype(jnp.int32))
    nxt_i = jnp.where(jnp.arange(V) + 1 >= cnt_in, 0, jnp.arange(V) + 1)
    q = poly[nxt_i]
    side_q = d[0] * (q[:, 1] - a[1]) - d[1] * (q[:, 0] - a[0])
    inside_q = (side_q >= 0) & pmask

    denom = side - side_q
    t = side / jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    inter = poly + jnp.clip(t, 0.0, 1.0)[:, None] * (q - poly)

    # per input edge: emit current vertex if inside; emit intersection if
    # the edge crosses the boundary
    emit1 = inside
    emit2 = pmask & (inside ^ inside_q)

    verts = jnp.stack([poly, inter], axis=1).reshape(2 * V, 2)
    emits = jnp.stack([emit1, emit2], axis=1).reshape(2 * V)
    # compact to the front (order preserving)
    pos = jnp.cumsum(emits) - 1
    out = jnp.zeros((2 * V, 2), poly.dtype)
    out = out.at[jnp.where(emits, pos, 2 * V - 1)].set(
        jnp.where(emits[:, None], verts, 0.0), mode="drop")
    cnt = jnp.sum(emits.astype(jnp.int32))
    omask = jnp.arange(2 * V) < cnt
    # fill masked tail with first vertex (harmless for area)
    out = jnp.where(omask[:, None], out, out[0])
    return out[:V], omask[:V]  # V>=8 suffices: rect-rect clip has <= 8 verts


def _pair_overlap_bev(c1: jax.Array, c2: jax.Array) -> jax.Array:
    """Overlap area of two BEV rectangles given corners (4,2) each."""
    V = 8
    poly = jnp.zeros((V, 2), c1.dtype).at[:4].set(c1)
    poly = jnp.where((jnp.arange(V) < 4)[:, None], poly, c1[0])
    pmask = jnp.arange(V) < 4

    def clip_edge(i, carry):
        poly, pmask = carry
        a = c2[i]
        b = c2[(i + 1) % 4]
        return _clip_poly_halfplane(poly, pmask, a, b)

    for i in range(4):
        poly, pmask = clip_edge(i, (poly, pmask))
    return _polygon_area(poly, pmask.astype(c1.dtype))


def _ensure_ccw(corners: jax.Array) -> jax.Array:
    """Make corner order CCW (clipping assumes inside = left of edges)."""
    area2 = ((corners[..., 1, 0] - corners[..., 0, 0]) * (corners[..., 2, 1] - corners[..., 0, 1])
             - (corners[..., 2, 0] - corners[..., 0, 0]) * (corners[..., 1, 1] - corners[..., 0, 1]))
    return jnp.where((area2 >= 0)[..., None, None], corners, corners[..., ::-1, :])


@jax.jit
def boxes_overlap_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise BEV overlap areas: (N, 7) x (M, 7) -> (N, M)."""
    ca = _ensure_ccw(_box_corners_bev(boxes_a))
    cb = _ensure_ccw(_box_corners_bev(boxes_b))
    f = jax.vmap(jax.vmap(_pair_overlap_bev, in_axes=(None, 0)), in_axes=(0, None))
    return f(ca, cb)


@jax.jit
def boxes_iou3d(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise 3D IoU (N, M) (ref: boxes_iou3d_gpu)."""
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)
    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zo = jnp.maximum(jnp.minimum(za2[:, None], zb2[None, :]) -
                     jnp.maximum(za1[:, None], zb1[None, :]), 0.0)
    inter = overlap_bev * zo
    va = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vb = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.clip(va + vb - inter, 1e-6)


@jax.jit
def boxes_giou3d(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise GIoU3D (ref: boxes_giou3d_gpu, used by the tracker's
    association: GIoU = IoU - (hull - union)/hull with an axis-aligned-hull
    approximation of the convex hull of corners in BEV x z-extent."""
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)
    ca = _box_corners_bev(boxes_a)
    cb = _box_corners_bev(boxes_b)
    # hull approximation: bounding box over both corner sets, per pair
    amin = jnp.min(ca, axis=1)  # (N, 2)
    amax = jnp.max(ca, axis=1)
    bmin = jnp.min(cb, axis=1)
    bmax = jnp.max(cb, axis=1)
    hmin = jnp.minimum(amin[:, None, :], bmin[None, :, :])
    hmax = jnp.maximum(amax[:, None, :], bmax[None, :, :])
    hull_bev = jnp.prod(jnp.clip(hmax - hmin, 0.0), axis=-1)

    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zo = jnp.maximum(jnp.minimum(za2[:, None], zb2[None, :]) -
                     jnp.maximum(za1[:, None], zb1[None, :]), 0.0)
    zh = jnp.maximum(za2[:, None], zb2[None, :]) - jnp.minimum(za1[:, None], zb1[None, :])

    inter = overlap_bev * zo
    hull = hull_bev * zh
    va = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vb = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    union = va + vb - inter
    iou = inter / jnp.clip(union, 1e-6)
    return iou - (hull - union) / jnp.clip(hull, 1e-6)


@functools.partial(jax.jit, static_argnames=("max_keep",))
def nms_bev(boxes: jax.Array, scores: jax.Array, mask: jax.Array,
            iou_thresh: float = 0.1, max_keep: int = 128
            ) -> Tuple[jax.Array, jax.Array]:
    """Greedy rotated-BEV NMS (ref: nms_gpu / class-agnostic NMS in
    sensor_inference/utils/model_nms_utils.py:4-21).

    Returns (keep_idx (max_keep,), keep_mask (max_keep,)).  Implemented as a
    masked greedy sweep over the top-``max_keep`` candidates with a
    precomputed IoU matrix — O(K^2) tensor work, no dynamic shapes.
    """
    k = min(max_keep, boxes.shape[0])
    s = jnp.where(mask, scores, -jnp.inf)
    top_s, top_i = jax.lax.top_k(s, k)
    cand = boxes[top_i]
    valid = jnp.isfinite(top_s)
    iou = boxes_iou3d(cand, cand)

    def body(i, keep):
        # keep candidate i unless suppressed by an earlier kept box
        sup = jnp.any((iou[:, i] > iou_thresh) & keep & (jnp.arange(k) < i))
        return keep.at[i].set(valid[i] & ~sup)

    keep = jax.lax.fori_loop(0, k, body, jnp.zeros(k, bool))
    return top_i, keep

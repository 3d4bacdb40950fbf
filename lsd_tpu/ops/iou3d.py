"""Rotated 3D box IoU / GIoU and BEV NMS — vectorized JAX.

TPU-native replacement for the reference's CUDA kernels
(sensor_driver/inference/iou3d_nms/src/iou3d_nms_kernel.cpp(.cu) +
iou3d_cpu.cpp): rotated-rectangle overlap via vertex enumeration (corner
containment + edge intersections, angle-sorted with lax.sort), batched as
pure tensor ops — no data-dependent loops, no per-pair scatters.

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


def _inside_quad(corners: jax.Array, pts: jax.Array) -> jax.Array:
    """CCW quad (4, 2) x points (P, 2) -> (P,) inside flags."""
    a = corners
    b = jnp.roll(corners, -1, axis=0)
    d = b - a                                             # (4, 2)
    rel = pts[:, None, :] - a[None, :, :]                 # (P, 4, 2)
    cross = d[None, :, 0] * rel[..., 1] - d[None, :, 1] * rel[..., 0]
    return jnp.all(cross >= -1e-6, axis=-1)


def _pair_overlap_bev(c1: jax.Array, c2: jax.Array) -> jax.Array:
    """Overlap area of two BEV rectangles given CCW corners (4, 2) each.

    Vertex-enumeration method (the same scheme as the reference's CUDA
    iou3d kernel, sensor_driver/inference/iou3d_nms/iou3d_nms_kernel.cu):
    the intersection polygon's vertices are corners of A inside B, corners
    of B inside A, and edge-edge intersections (24 candidates).  Sort them
    by angle around their centroid with lax.sort (fully vectorized — no
    per-pair scatters, unlike Sutherland-Hodgman compaction) and take the
    shoelace area.
    """
    # corner containment (8 candidates)
    a_in = _inside_quad(c2, c1)
    b_in = _inside_quad(c1, c2)
    # edge-edge intersections (16 candidates)
    a0 = c1
    a1 = jnp.roll(c1, -1, axis=0)
    b0 = c2
    b1 = jnp.roll(c2, -1, axis=0)
    da = (a1 - a0)[:, None, :]                            # (4, 1, 2)
    db = (b1 - b0)[None, :, :]                            # (1, 4, 2)
    rel = b0[None, :, :] - a0[:, None, :]                 # (4, 4, 2)
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    safe = jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    t = (rel[..., 0] * db[..., 1] - rel[..., 1] * db[..., 0]) / safe
    u = (rel[..., 0] * da[..., 1] - rel[..., 1] * da[..., 0]) / safe
    hit = (jnp.abs(denom) >= 1e-9) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    inter = a0[:, None, :] + t[..., None] * da            # (4, 4, 2)

    pts = jnp.concatenate([c1, c2, inter.reshape(16, 2)], axis=0)   # (24, 2)
    valid = jnp.concatenate([a_in, b_in, hit.reshape(16)])
    cnt = jnp.sum(valid.astype(jnp.int32))
    w = valid.astype(c1.dtype)
    center = jnp.sum(pts * w[:, None], axis=0) / jnp.maximum(cnt, 1)
    ang = jnp.arctan2(pts[:, 1] - center[1], pts[:, 0] - center[0])
    ang = jnp.where(valid, ang, jnp.inf)                  # invalid sort last
    ang_s, px, py = jax.lax.sort((ang, pts[:, 0], pts[:, 1]), num_keys=1)
    sorted_pts = jnp.stack([px, py], axis=-1)
    # padding slots := first vertex -> their cross terms vanish and the
    # closing edge (last valid -> first) is included by the roll
    first = sorted_pts[0]
    sorted_pts = jnp.where((jnp.arange(24) < cnt)[:, None], sorted_pts, first)
    nxt = jnp.roll(sorted_pts, -1, axis=0)
    cross = sorted_pts[:, 0] * nxt[:, 1] - nxt[:, 0] * sorted_pts[:, 1]
    area = 0.5 * jnp.abs(jnp.sum(cross))
    return jnp.where(cnt >= 3, area, 0.0)


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

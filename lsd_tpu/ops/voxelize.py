"""Voxelization kernels (static shapes, mask-carrying).

TPU-native replacements for the reference's CUDA voxelizers:
- ``voxel_downsample`` — voxel-grid filter used on scans before LIO
  (ref: PCL VoxelGrid in slam/backend prefiltering + ikd-tree downsample,
  sensor_driver/common_lib/cpp_utils pointcloud_downsample)
- ``voxelize_dynamic`` — point->voxel feature gathering for detection
  (ref: sensor_driver/inference/voxelize/voxelization_kernel.cu)

Everything is sort-based: XLA sorts are fast on TPU and avoid the atomics
the CUDA implementation leans on.  All functions take and return fixed-size
arrays + validity masks (SURVEY.md §7 "hard parts": dynamic shapes).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

INT_SENTINEL = jnp.iinfo(jnp.int32).max


def voxel_keys(points: jax.Array, mask: jax.Array, voxel_size, origin=None,
               grid: int = 2048) -> jax.Array:
    """Quantize points to a flat voxel key; invalid points -> INT_SENTINEL.

    ``grid`` bounds each axis to [-grid/2, grid/2) voxels around origin;
    out-of-range points are treated as invalid.
    """
    if origin is not None:
        points = points - origin
    c = jnp.floor(points[..., :3] / voxel_size).astype(jnp.int32) + grid // 2
    in_range = jnp.all((c >= 0) & (c < grid), axis=-1)
    key = (c[..., 0] * grid + c[..., 1]) * grid + c[..., 2]
    return jnp.where(mask & in_range, key, INT_SENTINEL)


@functools.partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(points: jax.Array, mask: jax.Array, voxel_size: float,
                     capacity: int) -> Tuple[jax.Array, jax.Array]:
    """Keep one (mean) point per occupied voxel.

    points: (N, D>=3) with leading xyz; extra features are averaged too.
    Returns (out_points (capacity, D), out_mask (capacity,)).
    """
    n, d = points.shape
    keys = voxel_keys(points, mask, voxel_size)
    # multi-operand lax.sort carries the feature columns through the sort
    # network — no argsort + row gather (measured ~30% cheaper on TPU)
    sorted_ops = jax.lax.sort(
        (keys,) + tuple(points[:, k] for k in range(d)), num_keys=1)
    keys_s = sorted_ops[0]
    pts_s = jnp.stack(sorted_ops[1:], axis=-1)

    first = jnp.concatenate([jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]])
    first = first & (keys_s != INT_SENTINEL)
    # segment id per sorted point, capped to capacity
    seg = jnp.cumsum(first) - 1
    seg = jnp.where(keys_s == INT_SENTINEL, capacity, jnp.minimum(seg, capacity))

    sums = jax.ops.segment_sum(pts_s, seg, num_segments=capacity + 1)[:capacity]
    cnts = jax.ops.segment_sum(jnp.ones((n,), points.dtype), seg, num_segments=capacity + 1)[:capacity]
    out_mask = cnts > 0
    out = sums / jnp.maximum(cnts[:, None], 1.0)
    return jnp.where(out_mask[:, None], out, 0.0), out_mask


@functools.partial(jax.jit, static_argnames=("max_voxels", "max_points_per_voxel"))
def voxelize_dynamic(points: jax.Array, mask: jax.Array, voxel_size,
                     pc_range, max_voxels: int, max_points_per_voxel: int):
    """Group points into voxels for detection VFEs.

    points: (N, D) — xyz + features.  voxel_size: (3,), pc_range: (6,)
    [xmin ymin zmin xmax ymax zmax].

    Returns:
      voxels   (max_voxels, max_points_per_voxel, D)
      coords   (max_voxels, 3) int32  — z, y, x grid index (ref convention)
      num_pts  (max_voxels,) int32
      vmask    (max_voxels,) bool
    """
    n, d = points.shape
    # np (not jnp) for static values: they become inline HLO literals, not
    # captured device buffers (per-call host round-trip on tunneled TPU
    # backends).  Traced values stay jnp.
    def _as_const(x):
        try:
            return np.asarray(x, points.dtype)
        except (jax.errors.TracerArrayConversionError, TypeError):
            return jnp.asarray(x, points.dtype)
    voxel_size = _as_const(voxel_size)
    pc_range = _as_const(pc_range)
    gsz = jnp.floor((pc_range[3:] - pc_range[:3]) / voxel_size + 0.5).astype(jnp.int32)

    c = jnp.floor((points[:, :3] - pc_range[:3]) / voxel_size).astype(jnp.int32)
    in_range = jnp.all((c >= 0) & (c < gsz), axis=-1) & mask
    key = (c[:, 2] * gsz[1] + c[:, 1]) * gsz[0] + c[:, 0]
    key = jnp.where(in_range, key, INT_SENTINEL)

    # multi-operand sort: key + feature columns ride the sort network;
    # grid coords are recomputed from the sorted xyz (cheaper than
    # carrying 3 more operands or a post-sort row gather)
    sorted_ops = jax.lax.sort(
        (key,) + tuple(points[:, k] for k in range(d)), num_keys=1)
    key_s = sorted_ops[0]
    pts_s = jnp.stack(sorted_ops[1:], axis=-1)
    c_s = jnp.floor((pts_s[:, :3] - pc_range[:3]) / voxel_size).astype(jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
    valid_s = key_s != INT_SENTINEL
    first = first & valid_s
    seg = jnp.cumsum(first) - 1                      # voxel index per point
    rank = jnp.arange(n) - jnp.maximum(jax.lax.cummax(jnp.where(first, jnp.arange(n), -1)), 0)
    keep = valid_s & (seg < max_voxels) & (rank < max_points_per_voxel)

    seg_c = jnp.where(keep, seg, max_voxels)
    flat = seg_c * max_points_per_voxel + jnp.where(keep, rank, 0)
    voxels = jnp.zeros((max_voxels * max_points_per_voxel + max_points_per_voxel, d), points.dtype)
    voxels = voxels.at[flat].add(jnp.where(keep[:, None], pts_s, 0.0))
    voxels = voxels[: max_voxels * max_points_per_voxel].reshape(max_voxels, max_points_per_voxel, d)

    num_pts = jax.ops.segment_sum(keep.astype(jnp.int32), seg_c, num_segments=max_voxels + 1)[:max_voxels]
    coords_zyx = jnp.stack([c_s[:, 2], c_s[:, 1], c_s[:, 0]], axis=-1)
    coords = jnp.zeros((max_voxels + 1, 3), jnp.int32).at[seg_c].max(
        jnp.where((keep & first)[:, None], coords_zyx, -1))[:max_voxels]
    vmask = num_pts > 0
    return voxels, coords, num_pts, vmask

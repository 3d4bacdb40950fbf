"""Voxel/pillar feature encoders (flax).

Re-derivation of the reference's VFEs (sensor_inference/pytorch_model/
object_model/mean_vfe.py MeanVFE; PointPillar-style pillar encoder in
point_pillar.py) for dense-BEV TPU inference: the sparse 3D backbone of the
reference (spconv) has no good TPU story (SURVEY.md §7 hard parts), so
pillars + dense 2D convolutions carry the FLOPs on the MXU instead.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MeanVFE(nn.Module):
    """Average point features per voxel (ref mean_vfe.py:10-28)."""

    @nn.compact
    def __call__(self, voxels: jax.Array, num_points: jax.Array) -> jax.Array:
        # voxels (V, P, C); num_points (V,)
        s = jnp.sum(voxels, axis=1)
        return s / jnp.clip(num_points[:, None].astype(voxels.dtype), 1.0)


class PillarVFE(nn.Module):
    """PointNet-style pillar encoder: augment points with pillar-relative
    offsets, per-point MLP, masked max-pool."""
    num_filters: int = 64
    voxel_size: Tuple[float, float, float] = (0.32, 0.32, 6.0)
    pc_range: Tuple[float, float, float, float, float, float] = (-51.2, -51.2, -3.0, 51.2, 51.2, 3.0)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, voxels: jax.Array, coords: jax.Array,
                 num_points: jax.Array) -> jax.Array:
        # voxels (V, P, 4) [x y z intensity]; coords (V, 3) [z y x grid]
        V, P, C = voxels.shape
        npts = jnp.clip(num_points[:, None, None].astype(voxels.dtype), 1.0)
        pmask = (jnp.arange(P)[None, :] < num_points[:, None])[..., None].astype(voxels.dtype)

        mean_xyz = jnp.sum(voxels[..., :3], axis=1, keepdims=True) / npts
        f_cluster = voxels[..., :3] - mean_xyz
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        cx = (coords[:, 2:3].astype(voxels.dtype) + 0.5) * vx + self.pc_range[0]
        cy = (coords[:, 1:2].astype(voxels.dtype) + 0.5) * vy + self.pc_range[1]
        f_center = voxels[..., :2] - jnp.stack([cx, cy], axis=-1).reshape(V, 1, 2)

        feats = jnp.concatenate([voxels, f_cluster, f_center], axis=-1) * pmask
        x = nn.Dense(self.num_filters, dtype=self.dtype)(feats.astype(self.dtype))
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.relu(x)
        x = jnp.where(pmask > 0, x, -jnp.inf)
        x = jnp.max(x, axis=1)
        return jnp.where(jnp.isfinite(x), x, 0.0)


def scatter_to_voxel_bev(features: jax.Array, coords: jax.Array,
                         vmask: jax.Array, grid_hw: Tuple[int, int],
                         grid_z: int) -> jax.Array:
    """Scatter 3D-voxel features (V, C) into a dense height-compressed BEV
    image (H, W, Z*C): each z-bin becomes a channel group.

    This is the dense-TPU equivalent of the reference's height compression
    after its sparse 3D backbone (point_pillar.py to_bev reshape of the
    spconv volume): instead of sparse 3D convolutions followed by a z-stack,
    the z-stack happens at scatter time and dense 2D convolutions (MXU)
    carry the FLOPs.  coords are (V, 3) [z, y, x]."""
    H, W = grid_hw
    C = features.shape[-1]
    flat = jnp.where(vmask,
                     (coords[:, 1] * W + coords[:, 2]) * grid_z + coords[:, 0],
                     H * W * grid_z)
    vol = jnp.zeros((H * W * grid_z + 1, C), features.dtype)
    vol = vol.at[flat].add(features)
    return vol[:H * W * grid_z].reshape(H, W, grid_z * C)


class VoxelHeightEncoder(nn.Module):
    """Lift a height-compressed MeanVFE volume (H, W, Z*C) to backbone
    channels with a 1x1 conv — the role of the reference's last sparse-conv
    stage mixing height information into BEV channels
    (spconv_backbone.py conv_out)."""
    num_filters: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, vol: jax.Array) -> jax.Array:
        x = nn.Conv(self.num_filters, (1, 1), dtype=self.dtype)(
            vol.astype(self.dtype))
        # flax requires channels % num_groups == 0; gcd is divisor-safe for
        # any num_filters (e.g. 48 -> 16 groups)
        x = nn.GroupNorm(num_groups=math.gcd(32, self.num_filters),
                         dtype=self.dtype)(x)
        return nn.relu(x)


def scatter_to_bev_s2d(features: jax.Array, coords: jax.Array,
                       vmask: jax.Array, grid_hw: Tuple[int, int],
                       factor: int) -> jax.Array:
    """Scatter FINE pillar features (V, C) space-to-depth into a coarse
    BEV image (H/f, W/f, f*f*C): pillar (y, x) lands in coarse cell
    (y//f, x//f), channel group (y%f)*f + (x%f).

    This is the TPU answer to the reference's 0.1 m sparse-conv input
    (sensor_inference/cfgs/detection_object.yaml VOXEL_SIZE [0.1,0.1,
    0.15] over +-64 m): a dense 1280^2 conv stack would waste MXU tiles
    on empty cells and blow activation memory, while subpixel channel
    groups keep the full 0.1 m geometry visible to the first convolution
    at a 640^2 spatial extent — dense, static-shaped, MXU-tileable.
    coords are (V, 3) [z, y, x] in FINE grid units."""
    H, W = grid_hw
    f = int(factor)
    Hc, Wc = H // f, W // f
    C = features.shape[-1]
    yc, xc = coords[:, 1] // f, coords[:, 2] // f
    grp = (coords[:, 1] % f) * f + (coords[:, 2] % f)
    flat = jnp.where(vmask, (yc * Wc + xc) * (f * f) + grp, Hc * Wc * f * f)
    bev = jnp.zeros((Hc * Wc * f * f + 1, C), features.dtype)
    bev = bev.at[flat].add(features)
    return bev[:Hc * Wc * f * f].reshape(Hc, Wc, f * f * C)


def scatter_to_bev(features: jax.Array, coords: jax.Array, vmask: jax.Array,
                   grid_hw: Tuple[int, int]) -> jax.Array:
    """Scatter pillar features (V, C) to a dense BEV image (H, W, C).

    coords are (V, 3) [z, y, x]; invalid pillars are dropped.
    (ref: PointPillarScatter in point_pillar.py)
    """
    H, W = grid_hw
    flat = jnp.where(vmask, coords[:, 1] * W + coords[:, 2], H * W)
    bev = jnp.zeros((H * W + 1, features.shape[-1]), features.dtype)
    bev = bev.at[flat].add(features)
    return bev[:H * W].reshape(H, W, features.shape[-1])

"""Monocular 3D detection (RTM3D-style keypoint network) in flax.

Re-derivation of the reference's mono3D path (docs/detect.md:56-70: RTM3D
— predict box keypoints, centroid, depth and orientation, recover the 3D
box; LSD's variant swaps in a Darknet-style backbone and adds a heatmap
output used by the camera-lidar late fusion).  TPU-first differences:
dense conv backbone with GroupNorm (no BN sync issues), static-shape
top-k decode, direct depth/dims/orientation regression with the camera
intrinsics unprojection (the paper's pseudo-inverse vertex solve refines
the same parameterization; the direct decode is its jit-friendly core).

Heads per stride-4 feature cell:
  heat   (C,)  class center heatmap (focal-loss target, also exported for
               fusion confidence per docs/detect.md:78)
  offset (2,)  sub-cell center offset
  depth  (1,)  inverse-sigmoid depth  z = 1/sigmoid(d) - 1
  dims   (3,)  log-scale l, w, h
  rot    (2,)  (sin, cos) of observation angle alpha
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class Mono3DConfig(NamedTuple):
    image_hw: Tuple[int, int] = (384, 640)
    num_classes: int = 4          # vehicle, pedestrian, cyclist, cone
    stride: int = 4
    max_objects: int = 64
    base_ch: int = 32


class ConvBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False)(x)
        x = nn.GroupNorm(num_groups=min(16, self.ch))(x)
        return nn.silu(x)


class ResBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        y = ConvBlock(self.ch // 2)(x)
        y = ConvBlock(self.ch)(y)
        return x + y


class Mono3D(nn.Module):
    cfg: Mono3DConfig = Mono3DConfig()

    @nn.compact
    def __call__(self, image: jax.Array) -> dict:
        """image (H, W, 3) float in [0, 1] -> prediction maps at stride 4."""
        c = self.cfg.base_ch
        x = ConvBlock(c, 2)(image[None])          # /2
        x = ConvBlock(c * 2, 2)(x)                # /4
        x = ResBlock(c * 2)(x)
        d4 = x
        x = ConvBlock(c * 4, 2)(x)                # /8
        x = ResBlock(c * 4)(x)
        x = ResBlock(c * 4)(x)
        d8 = x
        x = ConvBlock(c * 8, 2)(x)                # /16
        x = ResBlock(c * 8)(x)
        # FPN-style top-down back to /4 (keypoint nets need resolution)
        x = jax.image.resize(x, (1, d8.shape[1], d8.shape[2], x.shape[-1]),
                             "nearest")
        x = ConvBlock(c * 4)(jnp.concatenate([x, d8], axis=-1))
        x = jax.image.resize(x, (1, d4.shape[1], d4.shape[2], x.shape[-1]),
                             "nearest")
        feat = ConvBlock(c * 2)(jnp.concatenate([x, d4], axis=-1))

        heat = nn.Conv(self.cfg.num_classes, (1, 1),
                       bias_init=nn.initializers.constant(-4.6))(feat)
        offset = nn.Conv(2, (1, 1))(feat)
        depth = nn.Conv(1, (1, 1))(feat)
        dims = nn.Conv(3, (1, 1))(feat)
        rot = nn.Conv(2, (1, 1))(feat)
        return dict(heat=heat[0], offset=offset[0], depth=depth[0],
                    dims=dims[0], rot=rot[0])


def _nms_heat(heat: jax.Array) -> jax.Array:
    """3x3 max-pool peak selection (CenterNet-style)."""
    m = nn.max_pool(heat[None], (3, 3), strides=(1, 1), padding="SAME")[0]
    return jnp.where(jnp.abs(heat - m) < 1e-6, heat, -jnp.inf)


@functools.partial(jax.jit, static_argnames=("max_objects", "stride"))
def decode_mono3d(preds: dict, intrinsic: jax.Array, max_objects: int = 64,
                  stride: int = 4):
    """Prediction maps + camera intrinsic (3, 3) -> camera-frame 3D boxes.

    Returns (boxes (K, 7) [x y z l w h yaw_cam], scores (K,), labels (K,),
    valid (K,)).  Camera frame: x right, y down, z forward; yaw measured
    in the x-z ground plane (converted from the observation angle alpha
    using the ray direction, RTM3D convention).
    """
    heat = jax.nn.sigmoid(preds["heat"])
    H, W, C = heat.shape
    peaks = _nms_heat(heat)
    flat = peaks.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_objects)
    labels = idx % C
    cell = idx // C
    cy = (cell // W).astype(jnp.float32)
    cx = (cell % W).astype(jnp.float32)

    off = preds["offset"].reshape(-1, 2)[cell]
    u = (cx + jax.nn.sigmoid(off[:, 0])) * stride
    v = (cy + jax.nn.sigmoid(off[:, 1])) * stride

    z = 1.0 / jax.nn.sigmoid(preds["depth"].reshape(-1)[cell]) - 1.0
    dims = jnp.exp(jnp.clip(preds["dims"].reshape(-1, 3)[cell], -3.0, 3.0))
    rot = preds["rot"].reshape(-1, 2)[cell]
    alpha = jnp.arctan2(rot[:, 0], rot[:, 1])

    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx0, cy0 = intrinsic[0, 2], intrinsic[1, 2]
    X = (u - cx0) * z / fx
    Y = (v - cy0) * z / fy
    # global yaw = alpha + ray angle (RTM3D: theta = alpha + arctan(x/z))
    yaw = alpha + jnp.arctan2(X, z)

    boxes = jnp.stack([X, Y, z, dims[:, 0], dims[:, 1], dims[:, 2], yaw],
                      axis=1)
    valid = jnp.isfinite(scores) & (scores > 0.0) & (z > 0.1) & (z < 200.0)
    return boxes, jnp.where(valid, scores, 0.0), labels, valid


def make_mono3d_targets(cfg: Mono3DConfig, boxes_cam: np.ndarray,
                        labels: np.ndarray, intrinsic: np.ndarray) -> dict:
    """Ground-truth camera-frame boxes -> training target maps.

    boxes_cam (K, 7) [x y z l w h yaw_cam]; Gaussian heatmap splats at the
    projected centers + regression targets at the center cell.
    """
    H = cfg.image_hw[0] // cfg.stride
    W = cfg.image_hw[1] // cfg.stride
    heat = np.zeros((H, W, cfg.num_classes), np.float32)
    offset = np.zeros((H, W, 2), np.float32)
    depth = np.zeros((H, W, 1), np.float32)
    dims = np.zeros((H, W, 3), np.float32)
    rot = np.zeros((H, W, 2), np.float32)
    mask = np.zeros((H, W), bool)

    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx0, cy0 = intrinsic[0, 2], intrinsic[1, 2]
    for b, lab in zip(np.asarray(boxes_cam), np.asarray(labels)):
        x, y, z, l, w, h, yaw = b
        if z <= 0.1:
            continue
        u = (fx * x / z + cx0) / cfg.stride
        v = (fy * y / z + cy0) / cfg.stride
        ci, cj = int(v), int(u)
        if not (0 <= ci < H and 0 <= cj < W):
            continue
        # Gaussian radius scaled by projected size
        r = max(2, int(0.5 * fx * l / z / cfg.stride))
        ys, xs = np.ogrid[-ci:H - ci, -cj:W - cj]
        g = np.exp(-(xs * xs + ys * ys) / (2 * (r / 3.0) ** 2 + 1e-6))
        heat[:, :, int(lab)] = np.maximum(heat[:, :, int(lab)], g)
        offset[ci, cj] = [u - cj, v - ci]
        depth[ci, cj, 0] = z
        dims[ci, cj] = np.log(np.maximum([l, w, h], 1e-3))
        alpha = yaw - np.arctan2(x, z)
        rot[ci, cj] = [np.sin(alpha), np.cos(alpha)]
        mask[ci, cj] = True
    return dict(heat=heat, offset=offset, depth=depth, dims=dims, rot=rot,
                mask=mask)


def mono3d_loss(preds: dict, targets: dict) -> Tuple[jax.Array, dict]:
    """Focal heatmap loss + masked L1 regression losses."""
    heat = jax.nn.sigmoid(preds["heat"])
    gt = targets["heat"]
    pos = (gt > 0.999).astype(jnp.float32)
    neg_w = jnp.power(1.0 - gt, 4.0)
    eps = 1e-6
    pos_loss = -jnp.log(heat + eps) * jnp.power(1 - heat, 2.0) * pos
    neg_loss = -jnp.log(1 - heat + eps) * jnp.power(heat, 2.0) * neg_w * (1 - pos)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    l_heat = (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos

    m = targets["mask"][..., None].astype(jnp.float32)
    nm = jnp.maximum(jnp.sum(m), 1.0)
    l_off = jnp.sum(jnp.abs(jax.nn.sigmoid(preds["offset"]) - targets["offset"]) * m) / nm
    z_pred = 1.0 / jax.nn.sigmoid(preds["depth"]) - 1.0
    l_depth = jnp.sum(jnp.abs(z_pred - targets["depth"]) * m) / nm
    l_dims = jnp.sum(jnp.abs(preds["dims"] - targets["dims"]) * m) / nm
    l_rot = jnp.sum(jnp.abs(preds["rot"] - targets["rot"]) * m) / nm
    total = l_heat + l_off + l_depth + 2.0 * l_dims + l_rot
    return total, dict(heat=l_heat, offset=l_off, depth=l_depth,
                       dims=l_dims, rot=l_rot)

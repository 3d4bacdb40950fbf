"""Compact anchor-free 2D detector (flax) — the camera model family.

TPU-native replacement for the reference's camera detection path
(vendored yolov5 + pytorch_model/camera_model/point_yolo.py, deployed as a
TensorRT engine for trafficlight detection): a YOLOX/FCOS-style
single-stage head over a small strided conv backbone, bf16 convs on the
MXU, static top-K decoding.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    ch: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(16, self.ch), dtype=self.dtype)(x)
        return nn.silu(x)


class Yolo2DConfig(NamedTuple):
    num_classes: int = 8         # trafficlight color x pictogram combos
    channels: Tuple[int, ...] = (16, 32, 64, 128)
    stride: int = 16             # total output stride
    max_boxes: int = 64


class Yolo2D(nn.Module):
    cfg: Yolo2DConfig = Yolo2DConfig()

    @nn.compact
    def __call__(self, image: jax.Array) -> dict:
        """image (H, W, 3) float [0,1] -> maps at stride cfg.stride."""
        x = image[None] if image.ndim == 3 else image
        x = x.astype(jnp.bfloat16)
        chs = self.cfg.channels
        x = ConvBlock(chs[0], 2)(x)
        x = ConvBlock(chs[1], 2)(x)
        x = ConvBlock(chs[1], 1)(x)
        x = ConvBlock(chs[2], 2)(x)
        x = ConvBlock(chs[2], 1)(x)
        x = ConvBlock(chs[3], 2)(x)
        feat = ConvBlock(chs[3], 1)(x)
        obj = nn.Conv(1, (1, 1), dtype=jnp.float32,
                      bias_init=nn.initializers.constant(-4.6))(feat)
        cls = nn.Conv(self.cfg.num_classes, (1, 1), dtype=jnp.float32)(feat)
        box = nn.Conv(4, (1, 1), dtype=jnp.float32)(feat)  # l t r b (log-scale)
        out = dict(obj=obj, cls=cls, box=box)
        return {k: v[0] for k, v in out.items()} if image.ndim == 3 else out


@functools.partial(jax.jit, static_argnames=("stride", "max_boxes"))
def decode_yolo2d(preds: dict, stride: int = 16, max_boxes: int = 64):
    """-> (boxes_xyxy (K, 4), scores (K,), labels (K,), mask (K,))."""
    obj = jax.nn.sigmoid(preds["obj"][..., 0])
    cls = jax.nn.sigmoid(preds["cls"])
    H, W, C = cls.shape
    score_map = obj[..., None] * cls
    flat = score_map.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_boxes)
    c = idx % C
    pix = idx // C
    yy = (pix // W).astype(jnp.float32)
    xx = (pix % W).astype(jnp.float32)
    box = preds["box"].reshape(-1, 4)[pix]
    ltrb = jnp.exp(jnp.clip(box, -8, 8)) * stride
    cxp = (xx + 0.5) * stride
    cyp = (yy + 0.5) * stride
    boxes = jnp.stack([cxp - ltrb[:, 0], cyp - ltrb[:, 1],
                       cxp + ltrb[:, 2], cyp + ltrb[:, 3]], axis=-1)
    return boxes, scores, c, scores > 0.0


def nms_2d(boxes: jnp.ndarray, scores: jnp.ndarray, mask: jnp.ndarray,
           iou_thresh: float = 0.5):
    """Axis-aligned greedy NMS over the (already top-K) candidates."""
    k = boxes.shape[0]
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
    iou = inter / jnp.clip(area[:, None] + area[None, :] - inter, 1e-6)

    order = jnp.argsort(-jnp.where(mask, scores, -jnp.inf))
    iou_s = iou[order][:, order]
    valid = mask[order]

    def body(i, keep):
        sup = jnp.any((iou_s[:, i] > iou_thresh) & keep & (jnp.arange(k) < i))
        return keep.at[i].set(valid[i] & ~sup)

    keep_sorted = jax.lax.fori_loop(0, k, body, jnp.zeros(k, bool))
    keep = jnp.zeros(k, bool).at[order].set(keep_sorted)
    return keep

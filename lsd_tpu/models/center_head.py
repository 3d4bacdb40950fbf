"""CenterPoint detection heads + box decoding (flax).

Re-derivation of the reference's center_point_head.py (heatmap + regression
maps: center offset, z, log-dims, sin/cos rotation) and segment_head_bev.py
(freespace BEV segmentation).  Decoding is a fixed-K top-k over the
heatmap — static shapes, mask-carrying (ref: utils/object_post_process.py).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class CenterHead(nn.Module):
    num_classes: int = 3
    head_ch: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> dict:
        """x (..., H, W, C) -> dict of prediction maps (f32)."""
        shared = nn.relu(nn.Conv(self.head_ch, (3, 3), dtype=self.dtype)(x))

        def head(ch, name, bias_init=0.0):
            h = nn.relu(nn.Conv(self.head_ch, (3, 3), dtype=self.dtype,
                                name=name + "_conv1")(shared))
            return nn.Conv(ch, (1, 1), name=name + "_out",
                           bias_init=nn.initializers.constant(bias_init),
                           dtype=jnp.float32)(h)

        return dict(
            heatmap=head(self.num_classes, "hm", bias_init=-4.6),  # sigmoid(-4.6) ~ 0.01
            offset=head(2, "offset"),
            z=head(1, "z"),
            dim=head(3, "dim"),       # log(l, w, h)
            rot=head(2, "rot"),       # sin, cos
            seg=head(1, "seg"),       # freespace BEV segmentation
        )


def decode_boxes(preds: dict, voxel_size, pc_range, stride: int = 1,
                 max_boxes: int = 256) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Top-K decode: returns (boxes (K, 7), scores (K,), labels (K,), mask).

    boxes in world metric (x y z dx dy dz heading), OpenPCDet convention.
    """
    hm = jax.nn.sigmoid(preds["heatmap"].astype(jnp.float32))
    H, W, C = hm.shape
    flat = hm.reshape(-1)                                # (H*W*C)
    scores, idx = jax.lax.top_k(flat, max_boxes)
    cls = idx % C
    pix = idx // C
    yy = (pix // W).astype(jnp.float32)
    xx = (pix % W).astype(jnp.float32)

    def gather_map(m, ch):
        return m.reshape(-1, m.shape[-1])[pix, ch].astype(jnp.float32)

    ox = gather_map(preds["offset"], 0)
    oy = gather_map(preds["offset"], 1)
    z = gather_map(preds["z"], 0)
    dx = jnp.exp(gather_map(preds["dim"], 0))
    dy = jnp.exp(gather_map(preds["dim"], 1))
    dz = jnp.exp(gather_map(preds["dim"], 2))
    rot = jnp.arctan2(gather_map(preds["rot"], 0), gather_map(preds["rot"], 1))

    vx, vy = voxel_size[0] * stride, voxel_size[1] * stride
    x = (xx + ox) * vx + pc_range[0]
    y = (yy + oy) * vy + pc_range[1]
    boxes = jnp.stack([x, y, z, dx, dy, dz, rot], axis=-1)
    mask = scores > 0.0
    return boxes, scores, cls, mask

"""Dense BEV backbone (flax) — multi-scale residual CNN with upsample-concat.

Re-derivation of the reference's BaseBEVResBackbone
(sensor_inference/pytorch_model/object_model/base_bev_backbone.py: stages of
stride-2 residual blocks, each deconvolved back to a common stride and
concatenated).  bf16 convs keep the MXU busy; BatchNorm is replaced by
GroupNorm so inference needs no running stats plumbing.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResBlock(nn.Module):
    ch: int
    stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    dtype=self.dtype)(x)
        y = nn.GroupNorm(num_groups=min(32, self.ch), dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.ch, (3, 3), dtype=self.dtype)(y)
        y = nn.GroupNorm(num_groups=min(32, self.ch), dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype)(x)
        return nn.relu(x + y)


class BEVBackbone(nn.Module):
    layer_nums: Sequence[int] = (1, 2, 2)
    channels: Sequence[int] = (64, 128, 256)
    strides: Sequence[int] = (1, 2, 2)
    up_channels: Sequence[int] = (128, 128, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x (H, W, C) or (B, H, W, C) -> BEV features at the stride of
        stage 0 (strides[0]); later stages deconv back to it."""
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        ups = []
        out_stride = self.strides[0]
        total_stride = 1
        for i, (n, ch, st) in enumerate(zip(self.layer_nums, self.channels, self.strides)):
            x = ResBlock(ch, stride=st, dtype=self.dtype)(x)
            for _ in range(n - 1):
                x = ResBlock(ch, dtype=self.dtype)(x)
            total_stride *= st
            u = x
            up = total_stride // out_stride
            if up > 1:
                u = nn.ConvTranspose(self.up_channels[i], (up, up),
                                     strides=(up, up),
                                     dtype=self.dtype)(u)
            else:
                u = nn.Conv(self.up_channels[i], (3, 3), dtype=self.dtype)(u)
            ups.append(u)
        out = jnp.concatenate(ups, axis=-1)
        return out[0] if squeeze else out

"""Detection post-processing: thresholds + class-agnostic NMS.

Re-derivation of sensor_inference/utils/object_post_process.py:4-32 +
model_nms_utils.py:4-21: per-class score thresholds, then one NMS over all
classes (class-agnostic), fixed output budget.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.iou3d import nms_bev


class PostProcessConfig(NamedTuple):
    score_thresh: Tuple[float, ...] = (0.3, 0.35, 0.35)   # per class
    nms_iou: float = 0.1
    max_objects: int = 128


@functools.partial(jax.jit, static_argnames=("cfg",))
def postprocess(cfg: PostProcessConfig, boxes: jax.Array, scores: jax.Array,
                labels: jax.Array, mask: jax.Array
                ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(K,7), (K,), (K,) int, (K,) -> filtered/suppressed top max_objects."""
    thresh = jnp.asarray(cfg.score_thresh)[jnp.clip(labels, 0, len(cfg.score_thresh) - 1)]
    ok = mask & (scores >= thresh)
    idx, keep = nms_bev(boxes, scores, ok, cfg.nms_iou, cfg.max_objects)
    return boxes[idx], scores[idx], labels[idx], keep

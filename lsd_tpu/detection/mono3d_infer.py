"""Camera mono3D inference for the live pipeline.

The reference deploys a monocular 3D detector (RTM3D) on the camera DLA
beside the lidar TRT engine and late-fuses the object lists
(docs/detect.md:70-80).  This is the runtime half of our flax Mono3D
model (models/mono3d.py): JPEG in -> camera-frame 3D boxes -> lidar-frame
objects + image rects ready for detection/camera_fusion.fuse_camera_lidar.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def shipped_mono3d_weights() -> Optional[str]:
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "weights", "mono3d.msgpack")
    return p if os.path.exists(p) else None


def _cam_box_corners(box: np.ndarray) -> np.ndarray:
    """Camera-frame (7,) [x y z l w h yaw_cam] -> (8, 3) corners.
    Camera frame: x right, y down, z forward; yaw in the x-z ground plane
    (training/mono3d.py _corners convention)."""
    x, y, z, l, w, h, yaw = box[:7]
    dx = np.asarray([l, l, -l, -l, l, l, -l, -l]) / 2
    dz = np.asarray([w, -w, -w, w, w, -w, -w, w]) / 2
    dy = np.asarray([h, h, h, h, -h, -h, -h, -h]) / 2
    c, s = np.cos(yaw), np.sin(yaw)
    rx = c * dx + s * dz
    rz = -s * dx + c * dz
    return np.stack([x + rx, y + dy, z + rz], 1)


def cam_rect(box: np.ndarray, K: np.ndarray,
             image_hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """Project a camera-frame box to its image-plane rect (or None)."""
    P = _cam_box_corners(np.asarray(box, float))
    P = P[P[:, 2] > 0.1]
    if len(P) < 2:
        return None
    u = K[0, 0] * P[:, 0] / P[:, 2] + K[0, 2]
    v = K[1, 1] * P[:, 1] / P[:, 2] + K[1, 2]
    H, W = image_hw
    rect = np.asarray([u.min(), v.min(), u.max(), v.max()])
    if rect[2] < 0 or rect[3] < 0 or rect[0] > W or rect[1] > H:
        return None
    rect[0::2] = np.clip(rect[0::2], 0, W)
    rect[1::2] = np.clip(rect[1::2], 0, H)
    if rect[2] - rect[0] < 1 or rect[3] - rect[1] < 1:
        return None
    return rect


def cam_box_to_lidar(box_cam: np.ndarray, C2V: np.ndarray) -> np.ndarray:
    """Camera-frame (7,) -> lidar-frame (7,) [x y z l w h yaw] via the
    camera->lidar extrinsic C2V (4x4)."""
    b = np.asarray(box_cam, float)
    ctr = C2V[:3, :3] @ b[:3] + C2V[:3, 3]
    # length-axis direction in camera coords (x-z plane): (cos, 0, -sin)
    d_cam = np.asarray([np.cos(b[6]), 0.0, -np.sin(b[6])])
    d_l = C2V[:3, :3] @ d_cam
    yaw_l = float(np.arctan2(d_l[1], d_l[0]))
    return np.asarray([ctr[0], ctr[1], ctr[2], b[3], b[4], b[5], yaw_l],
                      np.float32)


class Mono3DInfer:
    """JPEG -> camera-frame mono3D -> lidar-frame object list."""

    def __init__(self, weights: Optional[str] = None,
                 score_thresh: float = 0.3, max_objects: int = 32,
                 mcfg=None):
        import jax
        import jax.numpy as jnp
        from ..models.mono3d import Mono3D, Mono3DConfig, decode_mono3d
        self.cfg = mcfg or Mono3DConfig()
        self.score_thresh = float(score_thresh)
        self.max_objects = int(max_objects)
        model = Mono3D(self.cfg)
        H, W = self.cfg.image_hw
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((H, W, 3), jnp.float32))
        weights = weights or shipped_mono3d_weights()
        if not weights:
            raise ValueError(
                "mono3d enabled but no weights configured and no shipped "
                "checkpoint (weights/mono3d.msgpack) — refusing to serve a "
                "random-init model (train one: python -m "
                "lsd_tpu.tools.train_mono3d)")
        from ..models.params_io import load_params
        params = jax.device_put(load_params(weights, params))

        @jax.jit
        def _predict(p, img, K):
            preds = model.apply(p, img)
            boxes, scores, labels, valid = decode_mono3d(
                preds, K, max_objects=self.max_objects)
            return boxes, scores, labels, valid, jax.nn.sigmoid(preds["heat"])

        self._params = params
        self._predict = _predict
        self._jnp = jnp

    def _prep(self, image, K: np.ndarray):
        """Decode/resize the camera frame to the model's input size and
        scale the intrinsic to match."""
        import cv2
        if isinstance(image, (bytes, bytearray)):
            image = cv2.imdecode(np.frombuffer(bytes(image), np.uint8), 1)
            if image is None:
                return None, None
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        img = np.asarray(image)
        H, W = self.cfg.image_hw
        h0, w0 = img.shape[:2]
        Ks = np.asarray(K, float).copy()
        if (h0, w0) != (H, W):
            img = cv2.resize(img, (W, H))
            Ks[0] *= W / w0
            Ks[1] *= H / h0
        if img.dtype != np.float32:
            img = img.astype(np.float32) / 255.0
        return img, Ks

    def detect(self, image, K: np.ndarray,
               C2V: Optional[np.ndarray] = None) -> Dict:
        """image: jpeg bytes or HxWx3 array; K: native intrinsic.

        Returns dict(camera_objs=[{box(cam), rect, score, label,
        box_lidar?}], heat=(Hh, Wh, C), K_scaled)."""
        img, Ks = self._prep(image, K)
        if img is None:
            return dict(camera_objs=[], heat=None, K_scaled=None)
        jnp = self._jnp
        boxes, scores, labels, valid, heat = self._predict(
            self._params, jnp.asarray(img), jnp.asarray(Ks, jnp.float32))
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        labels = np.asarray(labels)
        valid = np.asarray(valid)
        out: List[Dict] = []
        for k in range(len(boxes)):
            if not valid[k] or scores[k] < self.score_thresh:
                continue
            rect = cam_rect(boxes[k], Ks, self.cfg.image_hw)
            if rect is None:
                continue
            o = dict(box=boxes[k].astype(np.float32), rect=rect,
                     score=float(scores[k]), label=int(labels[k]),
                     source="camera")
            if C2V is not None:
                o["box_lidar"] = cam_box_to_lidar(boxes[k], C2V)
            out.append(o)
        return dict(camera_objs=out, heat=np.asarray(heat), K_scaled=Ks)

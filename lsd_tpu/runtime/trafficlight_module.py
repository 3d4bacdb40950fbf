"""Trafficlight inference pipeline stage.

Re-derivation of the reference's TrafficLightInfer
(sensor_inference/trafficlight_infer.py:19-83): consume camera frames, run
the 2D detector, select relevant map lights from the current pose, match
detections to lights, and attach proto-ready ``lights`` results to the
frame.  Works with the flax Yolo2D model (random-init until trained
weights are supplied — dummy-engine-style graceful degradation).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..detection.trafficlight import MapLight, match_detections, select_lights
from .pipeline import Module

try:
    import cv2
    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False


class TrafficlightModule(Module):
    def __init__(self, cfg):
        super().__init__("Trafficlight", blocking=cfg.input.mode == "offline")
        self.cfg = cfg
        self.predict_fn = None
        self.map_lights: List[MapLight] = []
        self.K = np.asarray([[1000.0, 0, 960], [0, 1000, 540], [0, 0, 1]])
        self.image_size = (1920, 1080)
        self.camera_name: Optional[str] = None

    def setup(self, cfg) -> None:
        tl = getattr(cfg, "trafficlight", None) or {}
        for l in tl.get("lights", []):
            self.map_lights.append(MapLight(str(l["name"]),
                                            np.asarray(l["position"], float)))
        if tl.get("intrinsic") is not None:
            self.K = np.asarray(tl["intrinsic"], float)
        if tl.get("image_size") is not None:
            self.image_size = tuple(tl["image_size"])
        self.camera_name = tl.get("camera")
        if tl.get("enable"):
            try:
                self.predict_fn = build_yolo_predict_fn(tl.get("weights"))
            except Exception as e:
                self.logger.warning("trafficlight model unavailable: %s", e)

    def process(self, d: Dict) -> Optional[Dict]:
        if not (HAS_CV2 and self.predict_fn and self.map_lights
                and d.get("image")):
            d.setdefault("lights", [])
            return d
        name = self.camera_name or next(iter(d["image"]))
        jpg = d["image"].get(name)
        if jpg is None:
            d.setdefault("lights", [])
            return d
        img = cv2.imdecode(np.frombuffer(jpg, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            d.setdefault("lights", [])
            return d
        pose = np.asarray(d.get("slam_pose", np.eye(4)), float)
        sel = select_lights(pose, self.map_lights, self.K,
                            image_size=self.image_size)
        if not sel:
            d["lights"] = []
            return d
        boxes, scores, labels, keep = self.predict_fn(img)
        d["lights"] = match_detections(sel, np.asarray(boxes),
                                       np.asarray(scores), np.asarray(labels),
                                       np.asarray(keep))
        return d


def build_yolo_predict_fn(weights: Optional[str] = None, input_hw=(256, 320)):
    """jitted image -> (boxes, scores, labels, keep) via the flax Yolo2D."""
    import jax
    import jax.numpy as jnp
    from ..models.yolo2d import Yolo2D, Yolo2DConfig, decode_yolo2d, nms_2d

    cfg = Yolo2DConfig()
    model = Yolo2D(cfg)
    H, W = input_hw
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((H, W, 3)))
    if weights:
        from ..models.params_io import load_params
        params = load_params(weights, params)

    @jax.jit
    def run(img_f32):
        preds = model.apply(params, img_f32)
        boxes, scores, labels, mask = decode_yolo2d(preds, cfg.stride,
                                                    cfg.max_boxes)
        keep = nms_2d(boxes, scores, mask)
        return boxes, scores, labels, keep

    def predict(image_bgr: np.ndarray):
        ih, iw = image_bgr.shape[:2]
        img = cv2.resize(image_bgr, (W, H)).astype(np.float32) / 255.0
        boxes, scores, labels, keep = run(jnp.asarray(img))
        # scale boxes back to original image coordinates
        sx, sy = iw / W, ih / H
        b = np.asarray(boxes) * np.asarray([sx, sy, sx, sy])
        return b, np.asarray(scores), np.asarray(labels), np.asarray(keep)

    return predict

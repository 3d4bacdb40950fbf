import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsd_tpu.models.yolo2d import Yolo2D, Yolo2DConfig, decode_yolo2d, nms_2d
from lsd_tpu.detection.trafficlight import (MapLight, match_detections,
                                            select_lights)


class TestYolo2D:
    def test_forward_and_decode(self):
        cfg = Yolo2DConfig(max_boxes=32)
        model = Yolo2D(cfg)
        img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (128, 160, 3)),
                          jnp.float32)
        params = model.init(jax.random.PRNGKey(0), img)
        preds = model.apply(params, img)
        assert preds["obj"].shape == (8, 10, 1)
        boxes, scores, labels, mask = decode_yolo2d(preds, stride=16, max_boxes=32)
        assert boxes.shape == (32, 4)
        assert np.all(np.isfinite(np.asarray(boxes)))
        # boxes are ordered xyxy
        b = np.asarray(boxes)
        assert np.all(b[:, 2] >= b[:, 0]) and np.all(b[:, 3] >= b[:, 1])

    def test_nms_2d(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                            jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        keep = nms_2d(boxes, scores, jnp.ones(3, bool), iou_thresh=0.5)
        assert np.asarray(keep).tolist() == [True, False, True]


class TestTrafficlight:
    def test_select_and_match(self):
        K = np.asarray([[1000.0, 0, 960], [0, 1000, 540], [0, 0, 1]])
        pose = np.eye(4)  # vehicle at origin facing +x
        lights = [MapLight("tl_near", np.asarray([30.0, 0.0, 5.0])),
                  MapLight("tl_far", np.asarray([200.0, 0.0, 5.0])),
                  MapLight("tl_behind", np.asarray([-20.0, 0.0, 5.0]))]
        sel = select_lights(pose, lights, K, image_size=(1920, 1080))
        names = [s["name"] for s in sel]
        assert names == ["tl_near"]  # far > 120 m, behind excluded
        uv = sel[0]["uv"]
        assert 0 <= uv[0] < 1920 and 0 <= uv[1] < 1080

        # a detection near the projected light matches; color class 1 = green
        boxes = np.asarray([[uv[0] - 20, uv[1] - 40, uv[0] + 20, uv[1] + 40],
                            [100, 100, 140, 180]])
        out = match_detections(sel, boxes, np.asarray([0.85, 0.9]),
                               np.asarray([1, 0]), np.asarray([True, True]))
        assert len(out) == 1
        assert out[0]["name"] == "tl_near" and out[0]["color"] == 1

"""Training for the camera 2D detector (traffic lights).

The reference trains its camera model externally (vendored yolov5 +
pytorch_model/camera_model/point_yolo.py, deployed as TRT —
sensor_inference/cfgs/detection_trafficlight.yaml); here the same role is
in-framework: a jitted anchor-free trainer for models/yolo2d.Yolo2D plus
a procedural traffic-light scene generator (housing + stacked lamps with
glow, distractor rectangles/poles, exposure jitter), so the
trafficlight path ships with trained weights instead of random init.

Targets match decode_yolo2d exactly: the cell containing a box center is
positive; obj=1 there; cls one-hot; box = log(ltrb distances / stride).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.yolo2d import Yolo2D, Yolo2DConfig, decode_yolo2d, nms_2d
from ..models.params_io import load_params, save_params
from ..utils.log import get_logger

COLORS = {0: (0.9, 0.12, 0.1), 1: (0.95, 0.75, 0.1), 2: (0.1, 0.85, 0.3)}
CLASS_NAMES = {0: "red", 1: "yellow", 2: "green", 3: "off"}


# --------------------------------------------------------------------------
# synthetic scenes


@dataclasses.dataclass
class TrafficLightSceneConfig:
    hw: Tuple[int, int] = (256, 320)
    max_lights: int = 3
    n_distractors: int = 6
    box_capacity: int = 8


class SyntheticTrafficLightDataset:
    """Procedural day/night street-ish scenes with stacked-lamp traffic
    lights.  Labels: 0 red, 1 yellow, 2 green, 3 off; gt box is the
    housing rectangle (x1, y1, x2, y2) in pixels."""

    def __init__(self, cfg: TrafficLightSceneConfig = TrafficLightSceneConfig(),
                 batch_size: int = 8, seed: int = 0):
        self.cfg = cfg
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def scene(self):
        cfg, rng = self.cfg, self.rng
        H, W = cfg.hw
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        # sky->ground gradient + color cast + noise
        base = rng.uniform(0.1, 0.7)
        img = np.stack([(base + 0.3 * (1 - yy / H))] * 3, -1)
        img *= rng.uniform(0.7, 1.1, 3)
        img += rng.normal(0, 0.03, img.shape)
        # distractor rectangles (buildings, signs, cars) + poles
        for _ in range(cfg.n_distractors):
            x0, y0 = rng.integers(0, W - 8), rng.integers(0, H - 8)
            w, h = rng.integers(6, 60), rng.integers(6, 60)
            img[y0:y0 + h, x0:x0 + w] = rng.uniform(0, 0.8, 3)
        boxes, labels = [], []
        for _ in range(int(rng.integers(1, cfg.max_lights + 1))):
            lw = int(rng.integers(8, 22))            # lamp diameter px
            hw_, hh = lw + 6, 3 * lw + 10            # housing size
            x0 = int(rng.integers(2, W - hw_ - 2))
            y0 = int(rng.integers(2, H - hh - 2))
            img[y0:y0 + hh, x0:x0 + hw_] = rng.uniform(0.02, 0.12)
            lit = int(rng.integers(0, 4))            # 3 = all off
            for slot in range(3):
                cy = y0 + 5 + slot * lw + lw // 2
                cx = x0 + hw_ // 2
                r = lw * 0.42
                d2 = (yy - cy) ** 2 + (xx - cx) ** 2
                lamp = d2 < r * r
                if slot == lit:
                    col = np.asarray(COLORS[lit])
                    img[lamp] = col
                    # glow halo
                    glow = np.exp(-d2 / (2 * (1.8 * r) ** 2))[..., None]
                    img = img * (1 - 0.5 * glow) + 0.5 * glow * col
                else:
                    img[lamp] = 0.08
            boxes.append([x0, y0, x0 + hw_, y0 + hh])
            labels.append(lit)
        img = np.clip(img * rng.uniform(0.8, 1.2), 0, 1).astype(np.float32)
        return img, np.asarray(boxes, np.float32), np.asarray(labels, np.int32)

    def batch(self) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        B, G = self.batch_size, cfg.box_capacity
        H, W = cfg.hw
        imgs = np.zeros((B, H, W, 3), np.float32)
        gb = np.zeros((B, G, 4), np.float32)
        gl = np.zeros((B, G), np.int32)
        gm = np.zeros((B, G), bool)
        for b in range(B):
            img, boxes, labels = self.scene()
            imgs[b] = img
            n = min(len(boxes), G)
            gb[b, :n], gl[b, :n], gm[b, :n] = boxes[:n], labels[:n], True
        return dict(image=imgs, gt_boxes=gb, gt_labels=gl, gt_mask=gm)

    def batches(self, n: int) -> Iterator[Dict[str, np.ndarray]]:
        for _ in range(n):
            yield self.batch()


# --------------------------------------------------------------------------
# targets + loss (must mirror decode_yolo2d's encoding)


def make_yolo_targets(cfg: Yolo2DConfig, hw: Tuple[int, int],
                      gt_boxes: jax.Array, gt_labels: jax.Array,
                      gt_mask: jax.Array) -> Dict[str, jax.Array]:
    """(G,4) xyxy px + labels -> stride-s maps: obj (h,w,1), cls
    (h,w,C), box (h,w,4) log-ltrb, pos (h,w)."""
    s = cfg.stride
    h, w = hw[0] // s, hw[1] // s
    obj = jnp.zeros((h, w), jnp.float32)
    cls = jnp.zeros((h, w, cfg.num_classes), jnp.float32)
    box = jnp.zeros((h, w, 4), jnp.float32)

    def add(carry, g):
        obj, cls, box = carry
        b, lab, m = g[:4], g[4].astype(jnp.int32), g[5] > 0
        cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
        gx = jnp.clip((cx // s).astype(jnp.int32), 0, w - 1)
        gy = jnp.clip((cy // s).astype(jnp.int32), 0, h - 1)
        cxp, cyp = (gx + 0.5) * s, (gy + 0.5) * s
        ltrb = jnp.stack([cxp - b[0], cyp - b[1], b[2] - cxp, b[3] - cyp])
        enc = jnp.log(jnp.clip(ltrb, 1e-3) / s)
        upd = m.astype(jnp.float32)
        obj = obj.at[gy, gx].max(upd)
        cls = cls.at[gy, gx, lab].max(upd)
        box = jnp.where(m, box.at[gy, gx].set(enc), box)
        return (obj, cls, box), None

    g = jnp.concatenate([gt_boxes, gt_labels[:, None].astype(jnp.float32),
                         gt_mask[:, None].astype(jnp.float32)], axis=1)
    (obj, cls, box), _ = jax.lax.scan(add, (obj, cls, box), g)
    return dict(obj=obj, cls=cls, box=box)


def yolo_loss(preds: Dict[str, jax.Array],
              targets: Dict[str, jax.Array]) -> Tuple[jax.Array, Dict]:
    obj_t = targets["obj"]
    pos = obj_t > 0
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    obj_p = preds["obj"][..., 0].astype(jnp.float32)
    # focal-weighted BCE over every cell
    p = jax.nn.sigmoid(obj_p)
    bce = optax.sigmoid_binary_cross_entropy(obj_p, obj_t)
    focal = jnp.where(pos, (1 - p) ** 2, p ** 2) * bce
    l_obj = jnp.sum(focal) / n_pos
    l_cls = jnp.sum(jnp.where(
        pos[..., None],
        optax.sigmoid_binary_cross_entropy(
            preds["cls"].astype(jnp.float32), targets["cls"]), 0.0)) / n_pos
    l_box = jnp.sum(jnp.where(
        pos[..., None],
        optax.huber_loss(preds["box"].astype(jnp.float32),
                         targets["box"], delta=1.0), 0.0)) / n_pos
    loss = l_obj + l_cls + 2.0 * l_box
    return loss, dict(obj=l_obj, cls=l_cls, box=l_box)


# --------------------------------------------------------------------------


class YoloTrainer:
    def __init__(self, cfg: Yolo2DConfig = Yolo2DConfig(num_classes=4),
                 hw: Tuple[int, int] = (256, 320), lr: float = 1e-3,
                 total_steps: int = 2000, seed: int = 0):
        self.cfg, self.hw = cfg, hw
        self.logger = get_logger("train_yolo")
        self.model = Yolo2D(cfg)
        self.params = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((*hw, 3), jnp.float32))
        sched = optax.warmup_cosine_decay_schedule(0.0, lr, 100,
                                                   max(total_steps, 101))
        self.tx = optax.chain(optax.clip_by_global_norm(10.0),
                              optax.adamw(sched, weight_decay=1e-4))
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        model, tx, hw_, c = self.model, self.tx, hw, cfg

        def loss_on_batch(params, batch):
            def one(img, gb, gl, gm):
                preds = model.apply(params, img)
                t = make_yolo_targets(c, hw_, gb, gl, gm)
                return yolo_loss(preds, t)
            losses, aux = jax.vmap(one)(batch["image"], batch["gt_boxes"],
                                        batch["gt_labels"], batch["gt_mask"])
            return jnp.mean(losses), jax.tree.map(jnp.mean, aux)

        def step_fn(params, opt_state, batch):
            (loss, aux), grads = jax.value_and_grad(
                loss_on_batch, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, aux

        self._step = jax.jit(step_fn, donate_argnums=(0, 1))

    def fit(self, batches, log_every: int = 50) -> Dict:
        t0 = time.monotonic()
        loss = float("nan")
        for batch in batches:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            self.params, self.opt_state, loss, _aux = self._step(
                self.params, self.opt_state, jb)
            self.step += 1
            if self.step % log_every == 0:
                lf = float(jax.device_get(loss))
                self.logger.info("step %d loss %.4f (%.1f steps/s)",
                                 self.step, lf,
                                 self.step / (time.monotonic() - t0))
        return dict(steps=self.step, final_loss=float(jax.device_get(loss)))

    # ------------------------------------------------------------------
    def evaluate(self, batches, score_thresh: float = 0.3,
                 iou_thresh: float = 0.5) -> Dict:
        """2D AP through decode + NMS (the deployment path)."""
        from ..detection.eval import ap_2d
        model, c = self.model, self.cfg

        @jax.jit
        def infer(params, img):
            preds = model.apply(params, img)
            boxes, scores, labels, mask = decode_yolo2d(preds, c.stride,
                                                        c.max_boxes)
            keep = nms_2d(boxes, scores, mask & (scores > score_thresh))
            return boxes, scores, labels, keep

        frames = []
        for batch in batches:
            for b in range(len(batch["image"])):
                boxes, scores, labels, keep = jax.device_get(
                    infer(self.params, jnp.asarray(batch["image"][b])))
                k = np.asarray(keep, bool)
                gm = np.asarray(batch["gt_mask"][b], bool)
                frames.append(dict(
                    boxes=np.asarray(boxes)[k],
                    scores=np.asarray(scores)[k],
                    labels=np.asarray(labels)[k],
                    gt_boxes=np.asarray(batch["gt_boxes"][b])[gm],
                    gt_labels=np.asarray(batch["gt_labels"][b])[gm]))
        per_class = {}
        for cid in range(c.num_classes):
            pb = [f["boxes"][f["labels"] == cid] for f in frames]
            ps = [f["scores"][f["labels"] == cid] for f in frames]
            gb = [f["gt_boxes"][f["gt_labels"] == cid] for f in frames]
            if sum(len(g) for g in gb) == 0:
                continue
            per_class[cid] = ap_2d(pb, ps, gb, iou_thresh=iou_thresh)["ap"]
        mean_ap = float(np.mean(list(per_class.values()))) if per_class else 0.0
        return dict(mean_ap=mean_ap, per_class=per_class)

    def save(self, path: str) -> str:
        return save_params(path, self.params)

    def load(self, path: str) -> None:
        self.params = load_params(path, self.params)

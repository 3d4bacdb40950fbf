"""Training for the monocular 3D detector (models/mono3d.py).

The reference deploys RTM3D on the Jetson DLA and trains it externally
(docs/detect.md:56-70); here the same role is in-framework: a procedural
camera-scene generator (shaded cuboids of the four deployment classes on
a ground plane, painter's-algorithm rasterization, distractors + exposure
jitter) and a jitted trainer for Mono3D, so the mono3D path ships with
trained weights instead of code-only.

Eval follows the nuScenes-style center-distance criterion (AP at a BEV
center match radius) plus mean absolute depth error — the quantities the
camera-lidar late fusion consumes (projected center + depth gating).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Dict, Iterator, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.mono3d import (Mono3D, Mono3DConfig, decode_mono3d,
                             make_mono3d_targets, mono3d_loss)
from ..models.params_io import load_params, save_params
from ..utils.log import get_logger

CLASS_NAMES = {0: "Vehicle", 1: "Pedestrian", 2: "Cyclist", 3: "Cone"}
# class dims (l, w, h) mean + jitter
_DIMS = {
    0: ((4.3, 1.85, 1.55), (0.5, 0.12, 0.12)),
    1: ((0.6, 0.6, 1.7), (0.1, 0.1, 0.12)),
    2: ((1.8, 0.6, 1.7), (0.2, 0.08, 0.1)),
    3: ((0.35, 0.35, 0.6), (0.05, 0.05, 0.08)),
}
_LIGHT = np.asarray([0.4, -0.8, 0.45])
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)


def default_intrinsic(hw: Tuple[int, int] = (384, 640)) -> np.ndarray:
    H, W = hw
    f = 0.875 * W
    return np.asarray([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1]],
                      np.float64)


def _fill_quad(img, shade, pts):
    """Rasterize a convex quad (4, 2) [u, v] with a flat shade (3,)."""
    H, W, _ = img.shape
    u0 = max(int(np.floor(pts[:, 0].min())), 0)
    u1 = min(int(np.ceil(pts[:, 0].max())) + 1, W)
    v0 = max(int(np.floor(pts[:, 1].min())), 0)
    v1 = min(int(np.ceil(pts[:, 1].max())) + 1, H)
    if u1 <= u0 or v1 <= v0:
        return
    uu, vv = np.meshgrid(np.arange(u0, u1) + 0.5, np.arange(v0, v1) + 0.5)
    inside = np.ones(uu.shape, bool)
    # convex polygon: consistent sign of cross products edge x (p - a).
    # The winding sign comes from the VERTICES (cross of consecutive
    # edges), not from a sampled pixel — for partially off-screen quads
    # the max-|cr| pixel of one edge can lie outside the quad and flip
    # the sign, silently rasterizing an empty mask.
    e01 = pts[1] - pts[0]
    e12 = pts[2] - pts[1]
    s = np.sign(e01[0] * e12[1] - e01[1] * e12[0])
    sign = s if s != 0 else 1.0
    for k in range(4):
        a, b = pts[k], pts[(k + 1) % 4]
        cr = (b[0] - a[0]) * (vv - a[1]) - (b[1] - a[1]) * (uu - a[0])
        inside &= (cr * sign) >= -1e-9
    img[v0:v1, u0:u1][inside] = shade


@dataclasses.dataclass
class Mono3DSceneConfig:
    hw: Tuple[int, int] = (384, 640)
    max_objects: int = 6
    n_distractors: int = 5
    cam_height: float = 1.5
    z_range: Tuple[float, float] = (5.0, 40.0)
    box_capacity: int = 8


class SyntheticMono3DDataset:
    """Shaded-cuboid street scenes with exact camera-frame 3D labels."""

    def __init__(self, cfg: Mono3DSceneConfig = Mono3DSceneConfig(),
                 batch_size: int = 4, seed: int = 0):
        self.cfg = cfg
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.K = default_intrinsic(cfg.hw)

    def _project(self, P):
        """Cam-frame points (N, 3) -> pixel (N, 2); z clamped for safety."""
        z = np.maximum(P[:, 2], 0.5)
        u = self.K[0, 0] * P[:, 0] / z + self.K[0, 2]
        v = self.K[1, 1] * P[:, 1] / z + self.K[1, 2]
        return np.stack([u, v], 1)

    def _corners(self, box):
        x, y, z, l, w, h, yaw = box
        # vertical axis is camera -y; yaw in the x-z ground plane
        dx = np.asarray([l, l, -l, -l, l, l, -l, -l]) / 2
        dz = np.asarray([w, -w, -w, w, w, -w, -w, w]) / 2
        dy = np.asarray([h, h, h, h, -h, -h, -h, -h]) / 2   # +h/2 = bottom
        c, s = np.cos(yaw), np.sin(yaw)
        rx = c * dx + s * dz
        rz = -s * dx + c * dz
        return np.stack([x + rx, y + dy, z + rz], 1)        # (8, 3)

    _FACES = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
              (1, 2, 6, 5), (2, 3, 7, 6), (3, 0, 4, 7)]

    def scene(self):
        cfg, rng = self.cfg, self.rng
        H, W = cfg.hw
        horizon = int(self.K[1, 2])
        img = np.empty((H, W, 3), np.float32)
        sky = rng.uniform(0.55, 0.85)
        gnd = rng.uniform(0.25, 0.45)
        img[:horizon] = sky + rng.normal(0, 0.02, (horizon, W, 3))
        grad = np.linspace(gnd * 1.2, gnd * 0.8, H - horizon)[:, None, None]
        img[horizon:] = grad + rng.normal(0, 0.02, (H - horizon, W, 3))
        # flat ground distractor patches (lane marks, shadows)
        for _ in range(cfg.n_distractors):
            z0 = rng.uniform(*cfg.z_range)
            x0 = rng.uniform(-0.6, 0.6) * z0
            pw, pl = rng.uniform(0.3, 2.5), rng.uniform(0.5, 4.0)
            quad = np.asarray([[x0 - pw, cfg.cam_height, z0 - pl],
                               [x0 + pw, cfg.cam_height, z0 - pl],
                               [x0 + pw, cfg.cam_height, z0 + pl],
                               [x0 - pw, cfg.cam_height, z0 + pl]])
            _fill_quad(img, np.full(3, rng.uniform(0.1, 0.9), np.float32),
                       self._project(quad))

        n_obj = int(rng.integers(1, cfg.max_objects + 1))
        boxes, labels = [], []
        for _ in range(n_obj):
            lab = int(rng.integers(0, 4))
            (dl, dw, dh), (jl, jw, jh) = _DIMS[lab]
            l = max(dl + rng.normal(0, jl), 0.2)
            w = max(dw + rng.normal(0, jw), 0.2)
            h = max(dh + rng.normal(0, jh), 0.3)
            z = rng.uniform(*cfg.z_range)
            x = rng.uniform(-0.45, 0.45) * z
            y = cfg.cam_height - h / 2.0          # sitting on the ground
            yaw = rng.uniform(-np.pi, np.pi)
            boxes.append([x, y, z, l, w, h, yaw])
            labels.append(lab)
        order = np.argsort([-b[2] for b in boxes])     # painter: far first
        albedo = {0: (0.55, 0.1), 1: (0.5, 0.2), 2: (0.45, 0.15),
                  3: (0.85, 0.05)}
        for i in order:
            b, lab = boxes[i], labels[i]
            corners = self._corners(np.asarray(b))
            base_col = np.clip(
                albedo[lab][0] + rng.normal(0, albedo[lab][1], 3), 0.05, 1.0)
            ctr = corners.mean(0)
            for f in self._FACES:
                p = corners[list(f)]
                n = np.cross(p[1] - p[0], p[3] - p[0])
                nn = np.linalg.norm(n)
                if nn < 1e-9:
                    continue
                n = n / nn
                if np.dot(n, ctr - p.mean(0)) > 0:
                    n = -n                          # outward
                if np.dot(n, p.mean(0)) > 0:        # facing away from camera
                    continue
                shade = np.clip(
                    base_col * (0.35 + 0.65 * abs(float(np.dot(n, _LIGHT)))),
                    0.02, 1.0).astype(np.float32)
                _fill_quad(img, shade, self._project(p))
        img = np.clip(img * rng.uniform(0.8, 1.2) +
                      rng.normal(0, 0.015, img.shape), 0, 1).astype(np.float32)
        return img, np.asarray(boxes, np.float32), np.asarray(labels, np.int32)

    def batch(self) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        B, G = self.batch_size, cfg.box_capacity
        H, W = cfg.hw
        imgs = np.zeros((B, H, W, 3), np.float32)
        gb = np.zeros((B, G, 7), np.float32)
        gl = np.zeros((B, G), np.int32)
        gm = np.zeros((B, G), bool)
        mcfg = Mono3DConfig(image_hw=cfg.hw)
        tg = {k: [] for k in ("heat", "offset", "depth", "dims", "rot", "mask")}
        for b in range(B):
            img, boxes, labels = self.scene()
            imgs[b] = img
            n = min(len(boxes), G)
            gb[b, :n], gl[b, :n], gm[b, :n] = boxes[:n], labels[:n], True
            t = make_mono3d_targets(mcfg, boxes[:n], labels[:n], self.K)
            for k in tg:
                tg[k].append(t[k])
        out = dict(image=imgs, gt_boxes=gb, gt_labels=gl, gt_mask=gm)
        out.update({"t_" + k: np.stack(v) for k, v in tg.items()})
        return out

    def batches(self, n: int) -> Iterator[Dict[str, np.ndarray]]:
        for _ in range(n):
            yield self.batch()


# --------------------------------------------------------------------------


class Mono3DTrainer:
    def __init__(self, cfg: Mono3DConfig = Mono3DConfig(), lr: float = 1e-3,
                 total_steps: int = 2000, seed: int = 0):
        self.cfg = cfg
        self.logger = get_logger("train_mono3d")
        self.model = Mono3D(cfg)
        self.params = self.model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((*cfg.image_hw, 3), jnp.float32))
        sched = optax.warmup_cosine_decay_schedule(0.0, lr, 100,
                                                   max(total_steps, 101))
        self.tx = optax.chain(optax.clip_by_global_norm(10.0),
                              optax.adamw(sched, weight_decay=1e-4))
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        model, tx = self.model, self.tx

        def loss_on_batch(params, batch):
            def one(img, heat, offset, depth, dims, rot, mask):
                preds = model.apply(params, img)
                t = dict(heat=heat, offset=offset, depth=depth, dims=dims,
                         rot=rot, mask=mask)
                return mono3d_loss(preds, t)
            losses, aux = jax.vmap(one)(
                batch["image"], batch["t_heat"], batch["t_offset"],
                batch["t_depth"], batch["t_dims"], batch["t_rot"],
                batch["t_mask"])
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
            self.params, self.opt_state, loss, aux = self._step(
                self.params, self.opt_state, jb)
            self.step += 1
            if self.step % log_every == 0:
                lf = float(jax.device_get(loss))
                self.logger.info("step %d loss %.4f (%.1f steps/s)",
                                 self.step, lf,
                                 self.step / (time.monotonic() - t0))
        return dict(steps=self.step, final_loss=float(jax.device_get(loss)))

    # ------------------------------------------------------------------
    def evaluate(self, batches, intrinsic: np.ndarray = None,
                 score_thresh: float = 0.25,
                 match_radius: float = 2.0) -> Dict:
        """Center-distance AP (BEV x/z match within ``match_radius`` m,
        nuScenes convention) + mean |depth error| of matched detections,
        through the deployment decode path."""
        K = intrinsic if intrinsic is not None else default_intrinsic(
            self.cfg.image_hw)
        model = self.model

        @jax.jit
        def infer(params, img):
            preds = model.apply(params, img)
            return decode_mono3d(preds, jnp.asarray(K, jnp.float32),
                                 self.cfg.max_objects, self.cfg.stride)

        frames = []
        for batch in batches:
            for b in range(len(batch["image"])):
                boxes, scores, labels, valid = jax.device_get(
                    infer(self.params, jnp.asarray(batch["image"][b])))
                k = np.asarray(valid, bool) & (np.asarray(scores) > score_thresh)
                gm = np.asarray(batch["gt_mask"][b], bool)
                frames.append(dict(
                    boxes=np.asarray(boxes)[k], scores=np.asarray(scores)[k],
                    labels=np.asarray(labels)[k],
                    gt_boxes=np.asarray(batch["gt_boxes"][b])[gm],
                    gt_labels=np.asarray(batch["gt_labels"][b])[gm]))

        per_class, depth_errs = {}, []
        for cid in range(self.cfg.num_classes):
            recs = []          # (score, tp) over all frames
            n_gt = 0
            for f in frames:
                p = f["labels"] == cid
                g = f["gt_labels"] == cid
                gtb = f["gt_boxes"][g]
                n_gt += len(gtb)
                used = np.zeros(len(gtb), bool)
                order = np.argsort(-f["scores"][p])
                pb, ps = f["boxes"][p][order], f["scores"][p][order]
                for box, sc in zip(pb, ps):
                    if len(gtb) == 0:
                        recs.append((sc, 0))
                        continue
                    d = np.hypot(box[0] - gtb[:, 0], box[2] - gtb[:, 2])
                    j = int(np.argmin(np.where(used, np.inf, d)))
                    if (not used[j]) and d[j] < match_radius:
                        used[j] = True
                        recs.append((sc, 1))
                        depth_errs.append(abs(box[2] - gtb[j, 2]))
                    else:
                        recs.append((sc, 0))
            if n_gt == 0:
                continue
            if not recs:
                per_class[CLASS_NAMES[cid]] = 0.0
                continue
            recs.sort(key=lambda r: -r[0])
            tp = np.cumsum([r[1] for r in recs])
            fp = np.cumsum([1 - r[1] for r in recs])
            rec = tp / n_gt
            prec = tp / np.maximum(tp + fp, 1)
            # 101-point interpolated AP
            ap = float(np.mean([prec[rec >= t].max() if (rec >= t).any()
                                else 0.0 for t in np.linspace(0, 1, 101)]))
            per_class[CLASS_NAMES[cid]] = round(ap, 4)
        mean_ap = (float(np.mean(list(per_class.values())))
                   if per_class else 0.0)
        return dict(mean_ap=round(mean_ap, 4), per_class=per_class,
                    mean_abs_depth_err_m=(round(float(np.mean(depth_errs)), 3)
                                          if depth_errs else None),
                    n_matched=len(depth_errs))

    def save(self, path: str) -> str:
        return save_params(path, self.params)

    def load(self, path: str) -> None:
        self.params = load_params(path, self.params)

"""Detection trainer: dp-sharded jitted steps + in-framework AP eval.

The role the reference delegates to OpenPCDet (train the CenterPoint
detector, docs/detect.md:69) done TPU-first: optax AdamW with warmup +
cosine decay, a single jitted train step vmapped over the batch and
sharded over the device mesh's data axis (gradients psum-reduced over
ICI), bfloat16-friendly loss math (the model computes in its param
dtype; losses accumulate in f32), msgpack checkpoints, and periodic AP
evaluation through the same decode/NMS path used at inference.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import CenterPointDetector, DetectorConfig
from ..models.detector import detection_loss, make_target_maps
from ..models.params_io import load_params, save_params
from ..utils.log import get_logger


@dataclasses.dataclass
class TrainerConfig:
    lr: float = 1e-3
    weight_decay: float = 1e-4
    warmup_steps: int = 100
    total_steps: int = 1000
    grad_clip: float = 10.0
    mesh_axis: str = "dp"
    log_every: int = 20


class Trainer:
    def __init__(self, det_cfg: DetectorConfig = DetectorConfig(),
                 cfg: TrainerConfig = TrainerConfig(),
                 mesh: Optional[jax.sharding.Mesh] = None,
                 seed: int = 0):
        self.det_cfg = det_cfg
        self.cfg = cfg
        self.logger = get_logger("train")
        self.model = CenterPointDetector(det_cfg)
        self.mesh = mesh
        k = jax.random.PRNGKey(seed)
        dummy_pts = jnp.zeros((1024, 4), jnp.float32)
        dummy_msk = jnp.zeros(1024, bool)
        self.params = self.model.init(k, dummy_pts, dummy_msk)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.warmup_steps, max(cfg.total_steps, cfg.warmup_steps + 1))
        self.tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip),
                              optax.adamw(sched, weight_decay=cfg.weight_decay))
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------
    def _build_train_step(self) -> Callable:
        model, det_cfg, tx = self.model, self.det_cfg, self.tx
        axis = self.cfg.mesh_axis

        def loss_on_batch(params, batch):
            def one(pts, msk, gb, gl, gm):
                preds = model.apply(params, pts, msk)
                targets = make_target_maps(det_cfg, gb, gl, gm)
                # freespace head trains against geometric drivable-area
                # labels from the same scan (ref segment_head_bev role)
                from ..models.detector import make_seg_target
                targets["seg"], targets["seg_mask"] = make_seg_target(
                    det_cfg, pts, msk)
                loss, aux = detection_loss(preds, targets)
                return loss, aux
            losses, aux = jax.vmap(one)(batch["points"], batch["mask"],
                                        batch["gt_boxes"],
                                        batch["gt_labels"].astype(jnp.int32),
                                        batch["gt_mask"])
            return jnp.mean(losses), jax.tree.map(jnp.mean, aux)

        def step_fn(params, opt_state, batch):
            (loss, aux), grads = jax.value_and_grad(
                loss_on_batch, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        if self.mesh is None:
            return jax.jit(step_fn, donate_argnums=(0, 1))

        # dp sharding: batch split over the mesh axis, params replicated,
        # gradient mean via the jit partitioner's psum over ICI
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sharding = NamedSharding(self.mesh, P(axis))
        repl = NamedSharding(self.mesh, P())
        mesh = self.mesh

        def sharded_step(params, opt_state, batch):
            batch = {k: jax.lax.with_sharding_constraint(v, batch_sharding)
                     for k, v in batch.items()}
            return step_fn(params, opt_state, batch)

        return jax.jit(sharded_step, donate_argnums=(0, 1),
                       out_shardings=(repl, repl, repl, repl))

    # ------------------------------------------------------------------
    def fit(self, batches: Iterator[Dict[str, np.ndarray]],
            eval_batches: Optional[list] = None,
            eval_every: int = 0,
            ckpt_path: Optional[str] = None) -> Dict:
        cfg = self.cfg
        t0 = time.monotonic()
        history = []
        loss = float("nan")
        for batch in batches:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            self.params, self.opt_state, loss, aux = self._train_step(
                self.params, self.opt_state, jb)
            self.step += 1
            if self.step % cfg.log_every == 0:
                loss_f = float(jax.device_get(loss))
                history.append(loss_f)
                self.logger.info("step %d loss %.4f (%.1f steps/s)",
                                 self.step, loss_f,
                                 self.step / (time.monotonic() - t0))
            if eval_every and eval_batches and self.step % eval_every == 0:
                metrics = self.evaluate(eval_batches)
                self.logger.info("step %d eval %s", self.step, metrics)
                if ckpt_path:
                    self.save(ckpt_path)
                    self.logger.info("checkpoint -> %s", ckpt_path)
        return dict(steps=self.step, final_loss=float(jax.device_get(loss)),
                    history=history)

    # ------------------------------------------------------------------
    def evaluate(self, batches, score_thresh: float = 0.3,
                 iou_thresh: float = 0.5) -> Dict:
        """AP through the deployment decode+NMS path."""
        from ..detection.eval import evaluate_frames
        from ..detection.post import PostProcessConfig, postprocess

        model = self.model
        det_cfg = self.det_cfg
        post_cfg = PostProcessConfig(
            score_thresh=(score_thresh,) * self.det_cfg.num_classes)

        @jax.jit
        def infer(params, pts, msk):
            preds = model.apply(params, pts, msk)
            boxes, scores, labels, mask = model.decode(preds)
            # seg IoU vs the geometric drivable-area labels
            from ..models.detector import make_seg_target
            seg_t, seg_m = make_seg_target(det_cfg, pts, msk)
            seg_p = (preds["seg"][..., 0] > 0.0).astype(jnp.float32) * seg_m
            seg_t = seg_t * seg_m
            inter = jnp.sum(seg_p * seg_t)
            union = jnp.sum(jnp.maximum(seg_p, seg_t))
            return postprocess(post_cfg, boxes, scores, labels, mask) \
                + (inter, union)

        frames = []
        seg_inter = seg_union = 0.0
        for batch in batches:
            for b in range(len(batch["points"])):
                boxes, scores, labels, keep, s_i, s_u = jax.device_get(infer(
                    self.params, jnp.asarray(batch["points"][b]),
                    jnp.asarray(batch["mask"][b])))
                seg_inter += float(s_i)
                seg_union += float(s_u)
                k = np.asarray(keep, bool)
                gm = np.asarray(batch["gt_mask"][b], bool)
                frames.append(dict(
                    boxes=np.asarray(boxes)[k],
                    scores=np.asarray(scores)[k],
                    labels=np.asarray(labels)[k],
                    gt_boxes=np.asarray(batch["gt_boxes"][b])[gm],
                    gt_labels=np.asarray(batch["gt_labels"][b])[gm]))
        per_class = evaluate_frames(frames, iou_thresh=iou_thresh)
        mean_ap = (float(np.mean([m["ap"] for m in per_class.values()]))
                   if per_class else 0.0)
        return dict(mean_ap=mean_ap,
                    seg_iou=round(seg_inter / max(seg_union, 1.0), 4),
                    per_class={k: v["ap"] for k, v in per_class.items()})

    # ------------------------------------------------------------------
    def save(self, path: str) -> str:
        return save_params(path, self.params)

    def load(self, path: str) -> None:
        self.params = load_params(path, self.params)

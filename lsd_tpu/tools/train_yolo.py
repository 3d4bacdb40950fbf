"""Traffic-light 2D detector training CLI.

    python -m lsd_tpu.tools.train_yolo --steps 2000 --batch 8 \
        --out /tmp/yolo2d_tl.msgpack

Trains models/yolo2d.Yolo2D on procedural traffic-light scenes
(training/yolo.py) and reports 2D AP through the decode+NMS deployment
path; weights feed runtime/trafficlight_module.build_yolo_predict_fn
via cfg.detection.trafficlight.weights.
"""
from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="/tmp/lsd_tpu_yolo2d.msgpack")
    ap.add_argument("--eval-batches", type=int, default=8)
    args = ap.parse_args(argv)

    from ..models.yolo2d import Yolo2DConfig
    from ..training.yolo import (SyntheticTrafficLightDataset,
                                 TrafficLightSceneConfig, YoloTrainer)

    scfg = TrafficLightSceneConfig()
    trainer = YoloTrainer(Yolo2DConfig(num_classes=4), hw=scfg.hw,
                          lr=args.lr, total_steps=args.steps)
    ds = SyntheticTrafficLightDataset(scfg, batch_size=args.batch)
    out = trainer.fit(ds.batches(args.steps))
    eval_ds = SyntheticTrafficLightDataset(scfg, batch_size=args.batch,
                                           seed=999)
    metrics = trainer.evaluate(list(eval_ds.batches(args.eval_batches)))
    path = trainer.save(args.out)
    print(f"trained {out['steps']} steps, final loss "
          f"{out['final_loss']:.4f}, 2D mAP {metrics['mean_ap']:.3f} "
          f"{metrics['per_class']}, weights -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

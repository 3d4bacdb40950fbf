"""Detection training CLI.

    python -m lsd_tpu.tools.train --steps 500 --batch 2 \
        [--data /path/to/labeled_recording] [--out weights.msgpack] \
        [--mesh-dp 8]

Without --data, trains on the synthetic scene generator (a smoke-train /
benchmarking mode); with --data, trains on annotated .pkl recordings
(frames carrying gt_boxes/gt_labels).  The reference's equivalent flow is
external OpenPCDet training + ONNX/TRT export (docs/detect.md:69,
pytorch_model/export/); here the same weights file feeds the runtime
detector directly (models/params_io + runtime build_detector_predict_fn).
"""
from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default=None,
                    help="labeled recording dir (synthetic scenes if unset)")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="/tmp/lsd_tpu_detector.msgpack")
    ap.add_argument("--mesh-dp", type=int, default=0,
                    help="shard batches over N devices (0 = single device)")
    ap.add_argument("--eval-every", type=int, default=0)
    ap.add_argument("--eval-batches", type=int, default=4,
                    help="held-out batches for the AP eval")
    ap.add_argument("--realistic", action="store_true",
                    help="lidar-realistic synthetic scenes (1/r density, "
                         "face visibility, shadows, wall/pole clutter)")
    ap.add_argument("--ref-capacity", action="store_true",
                    help="train the reference-capacity model (+-64 m, "
                         "0.2 m pillars, 640^2 grid)")
    ap.add_argument("--true-ref-capacity", action="store_true",
                    help="train at the reference's DEPLOYED pitch "
                         "(0.1 m pillars, 1280^2 fine grid, "
                         "space-to-depth 640^2 dense BEV)")
    ap.add_argument("--init", default=None,
                    help="warm-start from an existing checkpoint")
    args = ap.parse_args(argv)

    import jax
    import numpy as np
    from ..training import (LabeledFrameDataset, SyntheticDetectionDataset,
                            Trainer, TrainerConfig)

    mesh = None
    if args.mesh_dp:
        devs = np.asarray(jax.devices()[:args.mesh_dp])
        mesh = jax.sharding.Mesh(devs, ("dp",))

    from ..models import DetectorConfig
    det_cfg = (DetectorConfig.true_reference_capacity()
               if args.true_ref_capacity
               else DetectorConfig.reference_capacity() if args.ref_capacity
               else DetectorConfig())
    trainer = Trainer(det_cfg=det_cfg,
                      cfg=TrainerConfig(lr=args.lr, total_steps=args.steps),
                      mesh=mesh)
    if args.init:
        trainer.load(args.init)
    if args.data:
        ds = LabeledFrameDataset(args.data, batch_size=args.batch)
        batches = ds.batches(epochs=max(1, args.steps // max(len(ds), 1)))
        eval_batches = list(ds.batches(epochs=1))
    else:
        from ..training import SyntheticSceneConfig
        scfg = SyntheticSceneConfig(realistic=args.realistic)
        if args.ref_capacity or args.true_ref_capacity:
            scfg.xy_range = 60.0
        ds = SyntheticDetectionDataset(scfg, batch_size=args.batch)
        batches = ds.batches(args.steps)
        eval_batches = list(SyntheticDetectionDataset(
            scfg, batch_size=args.batch, seed=999).batches(args.eval_batches))

    out = trainer.fit(batches, eval_batches=eval_batches,
                      eval_every=args.eval_every,
                      ckpt_path=args.out if args.eval_every else None)
    metrics = trainer.evaluate(eval_batches)
    path = trainer.save(args.out)
    print(f"trained {out['steps']} steps, final loss {out['final_loss']:.4f}, "
          f"mean AP {metrics['mean_ap']:.3f}, weights -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Monocular 3D detector training CLI.

    python -m lsd_tpu.tools.train_mono3d --steps 3000 --batch 4 \
        --out weights/mono3d.msgpack

Trains models/mono3d.Mono3D (RTM3D-style keypoint network, the role of
the reference's DLA-deployed mono3D — docs/detect.md:56-70) on procedural
shaded-cuboid scenes (training/mono3d.py) and reports center-distance AP
plus mean depth error through the decode deployment path.
"""
from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="/tmp/lsd_tpu_mono3d.msgpack")
    ap.add_argument("--eval-batches", type=int, default=8)
    ap.add_argument("--small", action="store_true",
                    help="tiny model + 96x160 images (smoke testing)")
    args = ap.parse_args(argv)

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lsd_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    from ..utils.device import keep_session_alive
    keep_session_alive()

    from ..models.mono3d import Mono3DConfig
    from ..training.mono3d import (Mono3DSceneConfig, Mono3DTrainer,
                                   SyntheticMono3DDataset)

    hw = (96, 160) if args.small else (384, 640)
    mcfg = Mono3DConfig(image_hw=hw, base_ch=8 if args.small else 32)
    scfg = Mono3DSceneConfig(hw=hw)
    trainer = Mono3DTrainer(mcfg, lr=args.lr, total_steps=args.steps)
    ds = SyntheticMono3DDataset(scfg, batch_size=args.batch)
    out = trainer.fit(ds.batches(args.steps))
    eval_ds = SyntheticMono3DDataset(scfg, batch_size=args.batch, seed=999)
    metrics = trainer.evaluate(list(eval_ds.batches(args.eval_batches)))
    path = trainer.save(args.out)
    print(json.dumps(dict(steps=out["steps"],
                          final_loss=round(out["final_loss"], 4),
                          weights=path, **metrics)))
    return 0


if __name__ == "__main__":
    main()

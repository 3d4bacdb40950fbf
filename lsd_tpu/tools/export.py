"""Model export: ahead-of-time compiled deployment artifacts.

The reference's deployment flow freezes the torch model into an ONNX +
TensorRT engine (pytorch_model/export/spconv_object_pytorch2onnx.py,
generate_trt.sh).  The TPU-native equivalent serializes the jitted
inference function — weights baked in — to a portable StableHLO artifact
via jax.export: one file that any JAX runtime (same or newer jaxlib)
deserializes and calls with zero Python model code, and that XLA AOT
compiles per target platform.

    python -m lsd_tpu.tools.export --weights w.msgpack --out detector.hlo
    python -m lsd_tpu.tools.export --check detector.hlo

Artifact layout: 8-byte magic 'LSDTPU01' + 4-byte little-endian JSON
header length + JSON header (shapes, config) + serialized exported fn.
"""
from __future__ import annotations

import json
import struct
from typing import Optional, Tuple

_MAGIC = b"LSDTPU01"


def export_detector(params, det_cfg=None, post_cfg=None,
                    point_capacity: int = 2 ** 17,
                    out_path: str = "detector.hlo",
                    platforms: Optional[Tuple[str, ...]] = None) -> str:
    """Serialize points->(boxes, scores, labels, keep) with weights baked
    in.  `platforms` defaults to the current backend; pass e.g.
    ('tpu', 'cpu') for a multi-platform artifact."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..detection.post import PostProcessConfig, postprocess
    from ..models import CenterPointDetector, DetectorConfig

    det_cfg = det_cfg or DetectorConfig()
    post_cfg = post_cfg or PostProcessConfig()
    model = CenterPointDetector(det_cfg)

    def infer(points, mask):
        preds = model.apply(params, points, mask)
        boxes, scores, labels, m = model.decode(preds)
        return postprocess(post_cfg, boxes, scores, labels, m)

    args = (jax.ShapeDtypeStruct((point_capacity, 4), jnp.float32),
            jax.ShapeDtypeStruct((point_capacity,), jnp.bool_))
    exp = jexport.export(jax.jit(infer),
                         platforms=platforms)(*args)
    blob = exp.serialize()
    header = json.dumps(dict(
        kind="centerpoint_detector",
        point_capacity=point_capacity,
        num_classes=det_cfg.num_classes,
        pc_range=list(det_cfg.pc_range),
        voxel_size=list(det_cfg.voxel_size),
        max_objects=post_cfg.max_objects,
        platforms=list(exp.platforms))).encode()
    with open(out_path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)
    return out_path


class ExportedDetector:
    """Deserialized deployment artifact; call with (points, mask)."""

    def __init__(self, path: str):
        from jax import export as jexport
        with open(path, "rb") as f:
            magic = f.read(8)
            if magic != _MAGIC:
                raise ValueError(f"{path}: not an lsd_tpu export artifact")
            n = struct.unpack("<I", f.read(4))[0]
            self.meta = json.loads(f.read(n))
            self.exported = jexport.deserialize(f.read())

    def __call__(self, points, mask):
        import jax.numpy as jnp
        return self.exported.call(jnp.asarray(points, jnp.float32),
                                  jnp.asarray(mask, bool))


def main(argv=None) -> int:
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default=None,
                    help="msgpack weights (random init if unset)")
    ap.add_argument("--out", default="/tmp/lsd_tpu_detector.hlo")
    ap.add_argument("--points", type=int, default=2 ** 17)
    ap.add_argument("--check", default=None,
                    help="load an artifact and run a smoke inference")
    ap.add_argument("--int8", default=None, metavar="OUT.msgpack",
                    help="also write int8 per-channel PTQ weights (ref "
                         "generate_trt.sh --int8 role; models/quantize.py)")
    args = ap.parse_args(argv)

    import numpy as np

    if args.check:
        det = ExportedDetector(args.check)
        cap = det.meta["point_capacity"]
        pts = np.random.rand(cap, 4).astype(np.float32) * 20
        out = det(pts, np.ones(cap, bool))
        print(f"check ok: {det.meta['kind']} platforms="
              f"{det.meta['platforms']} -> boxes {np.asarray(out[0]).shape}")
        return 0

    import jax
    import jax.numpy as jnp
    from ..models import CenterPointDetector, DetectorConfig
    det_cfg = DetectorConfig()
    model = CenterPointDetector(det_cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1024, 4), jnp.float32),
                        jnp.zeros(1024, bool))
    if args.weights:
        from ..models.params_io import load_params
        params = load_params(args.weights, params)
    path = export_detector(params, det_cfg, point_capacity=args.points,
                           out_path=args.out)
    import os
    print(f"exported -> {path} ({os.path.getsize(path)} bytes)")
    if args.int8:
        from ..models.quantize import quantization_error, save_quantized
        qp = save_quantized(args.int8, params)
        err = max(quantization_error(params).values() or [0.0])
        print(f"int8 weights -> {qp} ({os.path.getsize(qp)} bytes, "
              f"max leaf rel err {err:.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

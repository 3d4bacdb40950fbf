"""int8 PTQ deployment path (models/quantize.py — the reference's
sparseconv_quantization.py / generate_trt.sh --int8 role)."""
import numpy as np
import jax
import jax.numpy as jnp

from lsd_tpu.models import CenterPointDetector, DetectorConfig
from lsd_tpu.models.params_io import load_params, save_params
from lsd_tpu.models.quantize import (dequantize_params, quantization_error,
                                     quantize_params, quantized_matmul,
                                     save_quantized)


def small_model():
    cfg = DetectorConfig(pc_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 3.0),
                         voxel_size=(0.5, 0.5, 6.0), max_voxels=256,
                         max_points_per_voxel=4, max_boxes=8)
    model = CenterPointDetector(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((256, 4), jnp.float32),
                        jnp.zeros(256, bool))
    return cfg, model, params


def test_quantize_roundtrip_error_small():
    _, _, params = small_model()
    q = quantize_params(params)
    deq = dequantize_params(q)
    errs = quantization_error(params)
    assert errs and max(errs.values()) < 0.01   # <1% of leaf max-abs
    # kernels became int8, biases stayed float
    flat_q = jax.tree_util.tree_leaves_with_path(q)
    kinds = {np.asarray(v).dtype.kind for _p, v in flat_q}
    assert "i" in kinds and "f" in kinds
    _ = deq


def test_quantized_checkpoint_loads_transparently(tmp_path):
    cfg, model, params = small_model()
    f32 = save_params(str(tmp_path / "w.msgpack"), params)
    q8 = save_quantized(str(tmp_path / "w.int8.msgpack"), params)
    import os
    assert os.path.getsize(q8) < 0.4 * os.path.getsize(f32)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-7, 7, (256, 4)).astype(np.float32))
    msk = jnp.ones(256, bool)
    p_f32 = load_params(f32, params)
    p_q8 = load_params(q8, params)
    out_f32 = model.apply(p_f32, pts, msk)
    out_q8 = model.apply(p_q8, pts, msk)
    # predictions track closely through the full network
    d = float(jnp.max(jnp.abs(out_f32["heatmap"] - out_q8["heatmap"])))
    ref = float(jnp.max(jnp.abs(out_f32["heatmap"]))) or 1.0
    assert d / ref < 0.15, d / ref


def test_quantized_matmul_matches_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    w = rng.normal(size=(64, 32)).astype(np.float32)
    amax = np.max(np.abs(w), axis=0)
    scale = (amax / 127.0).astype(np.float32)
    wq = jnp.asarray(np.clip(np.round(w / scale), -127, 127).astype(np.int8))
    y = quantized_matmul(x, wq, jnp.asarray(scale))
    ref = x @ w
    rel = float(jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel

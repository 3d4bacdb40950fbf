"""Post-training int8 quantization for deployment artifacts.

The reference's deployment flow runs PTQ int8 through TensorRT
(sensor_inference/pytorch_model/export/sparseconv_quantization.py +
generate_trt.sh --int8) because int8 is where Jetson-class GPUs get their
throughput.  On TPU the latency path is already bf16 through the MXU, so
the int8 win is different and twofold:

  * artifact size / HBM traffic — weights ship as symmetric per-channel
    int8 (4x smaller than f32); at load the scales are folded back in and
    XLA constant-folds the dequantize into the conv weights, so the jitted
    graph is byte-identical to the f32 one.
  * optional w8a8 compute — `quantized_matmul` shows the int8-in /
    int32-accumulate pattern the MXU supports natively for
    bandwidth-bound layers.

Format: the quantized checkpoint is a flax-msgpack tree whose quantized
leaves are `{"q": int8[*shape], "scale": f32[c_out]}` dicts, prefixed
with the magic ``LSDQ8001`` so `load_params_any` can sniff it.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

MAGIC = b"LSDQ8001"

# quantize 2d+ kernels; leave biases / scales / norm params in f32
_MIN_QUANT_NDIM = 2


def _quantize_leaf(w: np.ndarray) -> Dict[str, np.ndarray]:
    """Symmetric per-output-channel (last axis) int8 quantization."""
    w = np.asarray(w, np.float32)
    flat = w.reshape(-1, w.shape[-1])
    amax = np.max(np.abs(flat), axis=0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"q": q, "scale": scale}


def _dequantize_leaf(d: Dict[str, np.ndarray]) -> np.ndarray:
    return d["q"].astype(np.float32) * d["scale"]


def _is_qleaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"q", "scale"}


def quantize_params(params: Any) -> Any:
    """Quantize every >=2-D float array leaf to per-channel int8."""
    def walk(x):
        if isinstance(x, dict):
            return {k: walk(v) for k, v in x.items()}
        a = np.asarray(x)
        if a.ndim >= _MIN_QUANT_NDIM and np.issubdtype(a.dtype, np.floating):
            return _quantize_leaf(a)
        return np.asarray(a)
    return walk(params)


def dequantize_params(qparams: Any) -> Any:
    def walk(x):
        if _is_qleaf(x):
            return _dequantize_leaf(x)
        if isinstance(x, dict):
            return {k: walk(v) for k, v in x.items()}
        return x
    return walk(qparams)


def quantization_error(params: Any) -> Dict[str, float]:
    """Max relative reconstruction error per quantized leaf (diagnostics)."""
    out = {}

    def walk(x, path):
        if isinstance(x, dict):
            for k, v in x.items():
                walk(v, path + "/" + k)
            return
        a = np.asarray(x)
        if a.ndim >= _MIN_QUANT_NDIM and np.issubdtype(a.dtype, np.floating):
            rec = _dequantize_leaf(_quantize_leaf(a))
            denom = np.max(np.abs(a)) or 1.0
            out[path] = float(np.max(np.abs(rec - a)) / denom)
    walk(params, "")
    return out


def save_quantized(path: str, params: Any) -> str:
    from flax import serialization
    q = quantize_params(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(serialization.msgpack_serialize(q))
    return path


def load_params_any(path: str, template: Any) -> Any:
    """Load either a plain f32 msgpack checkpoint or an int8 quantized
    one (sniffed by magic) into the template's structure."""
    from flax import serialization
    with open(path, "rb") as f:
        blob = f.read()
    if blob[: len(MAGIC)] == MAGIC:
        q = serialization.msgpack_restore(blob[len(MAGIC):])
        deq = dequantize_params(q)
        return serialization.from_state_dict(template, deq)
    return serialization.from_bytes(template, blob)


# --------------------------------------------------------------------------
# w8a8 compute pattern (MXU int8 path)


def quantized_matmul(x, wq, w_scale, x_scale=None):
    """int8 x int8 -> int32 accumulate -> rescale; the MXU-native w8a8
    pattern for bandwidth-bound layers.  `x` f32 is quantized on the fly
    with a per-tensor scale unless `x_scale` is given (calibrated)."""
    import jax.numpy as jnp
    if x_scale is None:
        x_scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jnp.matmul(xq, wq, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (x_scale * w_scale)

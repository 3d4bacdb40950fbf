"""Matmul-precision control for trajectory-critical math.

On TPU, XLA's default f32 ``dot`` truncates inputs toward bfloat16 on the
MXU.  For the SLAM estimation path (point transforms, residual/Jacobian
reductions, covariance algebra) that truncation dominated the accuracy
budget: the 225-scan circle benchmark measures ATE 0.0214 m at default
precision vs 0.0017 m with float32-precision matmuls, at unchanged step
latency (the affected matmuls are (N,3)x(3,3) transforms and (N,24)
reductions — a negligible share of step time).  The reference runs its
whole filter in f64 Eigen (esekfom.hpp); float32-precision MXU passes are
the TPU-native equivalent, and measured ATE BEATS the reference's C++
stack on the same replay (0.0017 vs 0.0036 m — see EVAL_r03.md error
budget).

Detection/training deliberately stay bf16 (they are capacity-, not
precision-limited); only SLAM estimation entry points wrap themselves in
``mxu_f32``.
"""
from __future__ import annotations

import functools

import jax


def mxu_f32(fn):
    """Decorator: trace ``fn`` under float32 matmul precision.

    Compose UNDER jit: ``jax.jit(mxu_f32(f))`` — the context is active
    while jit traces the body, baking full-precision dots into the
    compiled program."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)
    return wrapped

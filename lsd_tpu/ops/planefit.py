"""Batched plane fitting + point-to-plane residuals.

Re-derivation of FAST-LIO's esti_plane + residual computation
(slam/mapping/fastlio/laserMapping.cpp:813-983 h_share_model): for every
scan point, fit a plane to its k map neighbors by solving A n = -1, check
inlier consistency, and emit the signed point-to-plane distance and unit
normal.  Fully vectorized over the scan — this is the hot kernel of LIO.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def fit_planes(neighbors: jax.Array, valid: jax.Array, inlier_thresh: float = 0.1
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fit a plane n.x + d = 0 (|n| = 1) per query.

    neighbors: (N, k, 3); valid: (N, k).
    Returns (normals (N, 3), d (N,), ok (N,)) where ok requires all valid
    neighbors within ``inlier_thresh`` of the plane and >= 3 valid points.
    """
    w = valid.astype(neighbors.dtype)
    # Solve (A^T W A) n = -A^T W 1   (FAST-LIO solves A n = -1 via QR)
    AtA = jnp.einsum("nki,nkj,nk->nij", neighbors, neighbors, w)
    Atb = -jnp.einsum("nki,nk->ni", neighbors, w)
    AtA = AtA + 1e-4 * jnp.eye(3, dtype=neighbors.dtype)
    n_raw = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]       # plane: n_raw.x + 1 = 0
    # f32 + near-singular systems can overflow to inf/nan: sanitize hard.
    finite = jnp.all(jnp.isfinite(n_raw), axis=-1)
    n_raw = jnp.where(finite[..., None], n_raw, 0.0)
    norm = jnp.linalg.norm(n_raw, axis=-1)
    normals = n_raw / jnp.maximum(norm, 1e-9)[..., None]
    d = jnp.where(norm > 1e-9, 1.0 / jnp.maximum(norm, 1e-9), 0.0)

    resid = jnp.abs(jnp.einsum("nki,ni->nk", neighbors, normals) + d[:, None])
    ok = (jnp.sum(valid, axis=-1) >= 3) & finite & (norm > 1e-6) & \
         jnp.all(jnp.where(valid, resid <= inlier_thresh, True), axis=-1)
    normals = jnp.where(ok[..., None], normals, 0.0)
    d = jnp.where(ok, d, 0.0)
    return normals, d, ok


def point_to_plane(points_world: jax.Array, normals: jax.Array, d: jax.Array
                   ) -> jax.Array:
    """Signed distance of world-frame points (N, 3) to planes (n, d)."""
    return jnp.einsum("ni,ni->n", points_world, normals) + d

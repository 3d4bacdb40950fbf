"""Multi-device LIO update: scan points sharded across the mesh.

The ESIKF information-matrix build (HtH, Htr) is a sum over scan points —
embarrassingly parallel.  Each device matches its point shard against a
replicated local map and computes partial (HtH, Htr); `psum` over ICI
reduces them; every device then solves the tiny 24x24 system redundantly
(cheaper than broadcasting the solution).

This is the TPU-native replacement for the reference's OpenMP-parallel
residual loop (laserMapping.cpp:819-822 MP_EN) — data parallelism over a
device mesh instead of host threads.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.hashmap import VoxelHashMap
from ..slam.lio import LioConfig, _gate_degenerate, _measurement_system, _update_mask
from ..slam.state import ERR_DIM, NavState, boxminus, boxplus


def sharded_lio_update(cfg: LioConfig, mesh: Mesh, nav_prop: NavState,
                       P_prop: jax.Array, m: VoxelHashMap,
                       pts_l: jax.Array, mask: jax.Array) -> NavState:
    """One iterated-update pass with points sharded over mesh axis 'dp'."""
    axis = mesh.axis_names[0]
    upd_mask = _update_mask(cfg)
    def partial_info(nav_i, m, pts_shard, mask_shard):
        H, r, valid, inv_var = _measurement_system(cfg, nav_i, pts_shard,
                                                   mask_shard, m)
        w = valid.astype(pts_shard.dtype)
        Hw = H * (w * inv_var)[:, None]
        return H.T @ Hw, Hw.T @ r

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis)),
        out_specs=P(),
    )
    def update(nav0, P_inv, m, pts_shard, mask_shard):
        def iterate(i, nav_i):
            HtH_p, Htr_p = partial_info(nav_i, m, pts_shard, mask_shard)
            HtH = jax.lax.psum(HtH_p, axis)
            Htr = jax.lax.psum(Htr_p, axis)
            E, _, _ = _gate_degenerate(cfg, HtH)
            HtH = E @ HtH @ E.T
            Htr = E @ Htr
            delta = boxminus(nav_i, nav0)
            dx = -jnp.linalg.solve(HtH + P_inv, Htr + P_inv @ delta) * upd_mask
            return boxplus(nav_i, dx)

        return jax.lax.fori_loop(0, cfg.max_iters, iterate, nav0)

    P_inv = jnp.linalg.inv(P_prop + 1e-9 * jnp.eye(ERR_DIM))
    return update(nav_prop, P_inv, m, pts_l, mask)

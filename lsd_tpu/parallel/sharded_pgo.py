"""Distributed pose-graph optimization over a device mesh.

The north-star scale-out component (BASELINE.json): keyframes/factors
sharded per device, Gauss-Newton normal equations solved by CG where every
Hessian-vector product is a *local* block einsum over the device's factor
shard followed by a ``psum`` over the mesh — the Schur-style Hessian-block
reduction over ICI instead of a shared-memory sparse solver (reference:
g2o + CSparse inside one process, slam/backend/graph_slam.cpp).

Design:
- one linearization per outer iteration: per-factor Jacobian blocks
  J_se3 (E, 6, 12), J_prior (G, 3, 6) and whitened residuals via vmapped
  ``jax.jacfwd`` of the same factor functions as the single-device solver;
- CG state (N, 6) is replicated; each device computes
  A_shard(v) = sum_e J_e^T (J_e gather(v)) over its edges, scatter-added
  into (N, 6) and psum-reduced;
- edges are padded to a device multiple; padding rows carry zero weight.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..geometry import so3
from ..slam.posegraph import (GraphNodes, PgoConfig, PoseGraphData,
                              _gps_residual, _huber_weights, _se3_residual)
from ..utils.precision import mxu_f32


def _se3_factor(d, qi0, pi0, qj0, pj0, qm, tm, si, w):
    qi = so3.quat_mul(qi0, so3.quat_from_rotvec(d[:3]))
    pi = pi0 + d[3:6]
    qj = so3.quat_mul(qj0, so3.quat_from_rotvec(d[6:9]))
    pj = pj0 + d[9:12]
    qi_inv = so3.quat_conj(qi)
    q_ij = so3.quat_mul(qi_inv, qj)
    t_ij = so3.quat_rotate(qi_inv, pj - pi)
    r_rot = so3.rotvec_from_quat(so3.quat_mul(so3.quat_conj(qm), q_ij))
    return jnp.concatenate([r_rot, t_ij - tm]) * si * w


def linearize_se3(nodes: GraphNodes, se3, rw) -> Tuple[jax.Array, jax.Array]:
    """-> (J (E, 6, 12), r (E, 6)) whitened, robust-weighted."""
    qi = nodes.quat[se3.idx[:, 0]]
    pi = nodes.pos[se3.idx[:, 0]]
    qj = nodes.quat[se3.idx[:, 1]]
    pj = nodes.pos[se3.idx[:, 1]]
    w = se3.mask.astype(jnp.float32) * rw

    def one(qi0, pi0, qj0, pj0, qm, tm, si, ww):
        z = jnp.zeros(12, jnp.float32)
        return (jax.jacfwd(_se3_factor)(z, qi0, pi0, qj0, pj0, qm, tm, si, ww),
                _se3_factor(z, qi0, pi0, qj0, pj0, qm, tm, si, ww))

    J, r = jax.vmap(one)(qi, pi, qj, pj, se3.q_meas, se3.t_meas, se3.sqrt_info, w)
    return J, r


def _pad_edges(se3, mult: int):
    E = se3.idx.shape[0]
    pad = (-E) % mult
    if pad == 0:
        return se3
    return type(se3)(
        idx=jnp.concatenate([se3.idx, jnp.zeros((pad, 2), jnp.int32)]),
        q_meas=jnp.concatenate([se3.q_meas, jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (pad, 1))]),
        t_meas=jnp.concatenate([se3.t_meas, jnp.zeros((pad, 3), jnp.float32)]),
        sqrt_info=jnp.concatenate([se3.sqrt_info, jnp.ones((pad, 6), jnp.float32)]),
        mask=jnp.concatenate([se3.mask, jnp.zeros(pad, bool)]),
    )


@functools.lru_cache(maxsize=32)
def _build_gn_round(mesh: Mesh, cfg: PgoConfig, n: int):
    """Cached jitted one-GN-round kernel (shard_map retraces per call
    otherwise — a jit wrapper + cache keyed on mesh/cfg/shape fixes it)."""
    axis = mesh.axis_names[0]

    @jax.jit
    @mxu_f32
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=P(),
    )
    def gn_round(nodes, se3_shard, gps, free):
        # robust weights at the linearization point
        r_se3 = _se3_residual(nodes, se3_shard,
                              jnp.zeros((n, 6), jnp.float32))
        rw = _huber_weights(r_se3, cfg.huber_delta)
        if cfg.dcs_phi > 0:
            # Dynamic Covariance Scaling on loop/cross edges — identical
            # semantics to the single-host solver (posegraph.optimize)
            is_loop = jnp.abs(se3_shard.idx[:, 0]
                              - se3_shard.idx[:, 1]) > 1
            chi2_se3 = jnp.sum(r_se3 ** 2, axis=-1)
            s2 = jnp.minimum(1.0, 2.0 * cfg.dcs_phi
                             / (cfg.dcs_phi + chi2_se3))
            rw = rw * jnp.where(is_loop, jnp.sqrt(s2), 1.0)
        J, r = linearize_se3(nodes, se3_shard, rw)          # local shard
        gi = se3_shard.idx                                   # (Es, 2)

        r_g = _gps_residual(nodes, gps, jnp.zeros((n, 6), jnp.float32))
        rw_g = _huber_weights(r_g, cfg.huber_delta)
        gate = (jnp.sum(r_g ** 2, -1) < cfg.gps_chi2_gate).astype(jnp.float32)
        wg = (gps.mask.astype(jnp.float32) * rw_g * gate)[:, None] * gps.sqrt_info

        def matvec(v):
            vv = jnp.concatenate([v[gi[:, 0]], v[gi[:, 1]]], axis=-1)  # (Es, 12)
            Jv = jnp.einsum("eij,ej->ei", J, vv)
            JtJv = jnp.einsum("eij,ei->ej", J, Jv)                      # (Es, 12)
            out = jnp.zeros((n, 6), jnp.float32)
            out = out.at[gi[:, 0]].add(JtJv[:, :6])
            out = out.at[gi[:, 1]].add(JtJv[:, 6:])
            out = jax.lax.psum(out, axis)
            # GPS priors touch translation only (replicated, add on one
            # device's worth then divide by ndev to avoid double count)
            gpsv = jnp.zeros((n, 6), jnp.float32).at[gps.idx, 3:].add(
                (wg ** 2) * v[gps.idx, 3:])
            out = out + gpsv
            return out * free + cfg.damping * v

        # gradient b = -J^T r (+ gps part)
        Jtr = jnp.einsum("eij,ei->ej", J, r)
        b = jnp.zeros((n, 6), jnp.float32)
        b = b.at[gi[:, 0]].add(Jtr[:, :6])
        b = b.at[gi[:, 1]].add(Jtr[:, 6:])
        b = jax.lax.psum(b, axis)
        b = b.at[gps.idx, 3:].add(wg * r_g)
        b = -b * free

        # block-Jacobi preconditioner: psum-reduced per-node 6x6 blocks
        # (matches the single-device solver's preconditioner so sharded
        # and local runs take identical CG trajectories)
        blocks = jnp.tile(cfg.damping * jnp.eye(6, dtype=jnp.float32),
                          (n, 1, 1)) / mesh.devices.size
        Bi = jnp.einsum("eij,eik->ejk", J[:, :, :6], J[:, :, :6])
        Bj = jnp.einsum("eij,eik->ejk", J[:, :, 6:], J[:, :, 6:])
        blocks = blocks.at[gi[:, 0]].add(Bi)
        blocks = blocks.at[gi[:, 1]].add(Bj)
        blocks = jax.lax.psum(blocks, axis)
        gw2 = jnp.broadcast_to(wg ** 2, (gps.idx.shape[0], 3))
        blocks = blocks.at[gps.idx, 3, 3].add(gw2[:, 0])
        blocks = blocks.at[gps.idx, 4, 4].add(gw2[:, 1])
        blocks = blocks.at[gps.idx, 5, 5].add(gw2[:, 2])
        # relative damping for the f32 block inverse (same conditioning
        # guard as the single-host solver; VERDICT r3 #9 sweep)
        scale = jnp.trace(blocks, axis1=-2, axis2=-1)[:, None, None] / 6.0
        blocks = blocks + (1e-5 * scale + cfg.damping) \
            * jnp.eye(6, dtype=jnp.float32)
        Binv = jnp.linalg.inv(blocks)

        def precond(rr):
            return jnp.einsum("nij,nj->ni", Binv, rr) * free

        def cg_step(state, _):
            x, rr, z, p = state
            Ap = matvec(p)
            rz = jnp.vdot(rr, z)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-12)
            x = x + alpha * p
            r_new = rr - alpha * Ap
            z_new = precond(r_new)
            beta = jnp.vdot(r_new, z_new) / jnp.maximum(rz, 1e-12)
            return (x, r_new, z_new, p * beta + z_new), None

        z0 = precond(b)
        (dx, *_), _ = jax.lax.scan(cg_step, (jnp.zeros_like(b), b, z0, z0),
                                   None, length=cfg.cg_iters)
        dx = dx * free
        return nodes._replace(
            quat=so3.quat_normalize(so3.quat_mul(nodes.quat, so3.quat_from_rotvec(dx[:, :3]))),
            pos=nodes.pos + dx[:, 3:])

    return gn_round


def optimize_sharded(graph: PoseGraphData, mesh: Mesh,
                     cfg: PgoConfig = PgoConfig()) -> PoseGraphData:
    """Distributed robust GN.  Semantics match posegraph.optimize for
    graphs with SE3 edges + GPS priors (floor/orient priors are node-local
    and currently handled on the replicated path)."""
    ndev = mesh.devices.size
    nodes = graph.nodes
    n = nodes.quat.shape[0]
    free = (nodes.mask & ~nodes.fixed).astype(jnp.float32)[:, None]
    se3 = _pad_edges(graph.se3, ndev)
    gn_round = _build_gn_round(mesh, cfg, n)
    for _ in range(cfg.outer_iters):
        nodes = gn_round(nodes, se3, graph.gps, free)
    return graph._replace(nodes=nodes)

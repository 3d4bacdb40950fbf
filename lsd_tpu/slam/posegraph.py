"""Pose-graph optimization: batched sparse Gauss-Newton in JAX.

Re-derivation of the reference's g2o backend (slam/backend/graph_slam.cpp +
hdl_graph_slam_nodelet.cpp factor construction; robust_graph_optimize with
GNSS outlier gating, backend_api.h:63) as a TPU-native solver:

- Factor types (matching hdl_graph_slam semantics):
  SE3 odometry/loop edges, GPS XYZ(or XY) priors, floor-plane (z +
  attitude) factors, IMU orientation priors, fixed-vertex gauge.
- Solver: matrix-free Gauss-Newton.  Residuals of all factors are built
  with vmap over static-capacity masked arrays; the normal equations are
  solved by preconditioned conjugate gradient using JVP/VJP of the residual
  function — no explicit sparse Hessian, so the same code paths shard over
  device meshes (edges are data-parallel).
- Robustness: Huber IRLS weights per outer iteration + chi-square gating
  that disables GNSS priors with gross residuals (the reference uses
  max-clique consistency filtering; chi2 gating preserves the observable
  behaviour — gross GNSS outliers do not bend the graph).

Nodes are (quat wxyz, pos) pairs; the error state is 6 per node
(rotation tangent, translation), right-perturbed like state.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import so3
from ..utils.precision import mxu_f32


class GraphNodes(NamedTuple):
    quat: jax.Array    # (N, 4)
    pos: jax.Array     # (N, 3)
    fixed: jax.Array   # (N,) bool — gauge anchors
    mask: jax.Array    # (N,) bool — slot in use


class Se3Edges(NamedTuple):
    idx: jax.Array       # (E, 2) int32 (i, j)
    q_meas: jax.Array    # (E, 4)  measured T_i^-1 T_j rotation
    t_meas: jax.Array    # (E, 3)  measured translation
    sqrt_info: jax.Array  # (E, 6) diagonal sqrt information [rot, trans]
    mask: jax.Array      # (E,)


class GpsPriors(NamedTuple):
    idx: jax.Array       # (G,) int32
    xyz: jax.Array       # (G, 3)
    sqrt_info: jax.Array  # (G, 3) diag sqrt info (zero z-entry = XY-only)
    mask: jax.Array      # (G,)


class FloorPriors(NamedTuple):
    idx: jax.Array       # (F,) int32
    z: jax.Array         # (F,) floor height at node
    sqrt_info: jax.Array  # (F, 3) [z, roll-ish, pitch-ish]
    mask: jax.Array      # (F,)


class OrientPriors(NamedTuple):
    idx: jax.Array       # (O,) int32
    quat: jax.Array      # (O, 4)
    sqrt_info: jax.Array  # (O, 3)
    mask: jax.Array      # (O,)


class PoseGraphData(NamedTuple):
    nodes: GraphNodes
    se3: Se3Edges
    gps: GpsPriors
    floor: FloorPriors
    orient: OrientPriors


class PgoConfig(NamedTuple):
    outer_iters: int = 6          # robust/GN relinearization rounds
    cg_iters: int = 50
    huber_delta: float = 1.0      # on whitened residual norm
    gps_chi2_gate: float = 25.0   # disable GNSS priors above this chi2
    damping: float = 1e-6
    # Dynamic-Covariance-Scaling-STYLE robustification (after Agarwal et
    # al., ICRA 2013 — intentionally MILDER than canonical DCS) on LOOP /
    # cross-session edges (any SE3 edge with |i-j| > 1; consecutive
    # odometry edges are never scaled).  With s = min(1, 2*phi/(phi +
    # chi2)), canonical DCS scales the residual by s (information by
    # s^2); here the residual is scaled by sqrt(s) (information by s) —
    # the gentler power because it STACKS with the Huber weight already
    # applied to every edge, and canonical DCS on top of Huber
    # double-penalized true loops during early rounds in campaign tuning.
    # A grossly-wrong loop's influence still decays like phi/chi2 -> 0.
    # Re-evaluated each outer round, so a true loop recovers as the
    # graph converges toward it.  All three solvers (single-host,
    # factor-sharded, Schur) implement this same sqrt-DCS+Huber variant.
    # This is the
    # reference's robust_graph_optimize role (backend_api.h:63 — its
    # max-clique gate serves the same "aliased match must not bend the
    # graph" purpose).  Campaign r3 measured loop edges with p95 trans
    # error 4.9 m passing all detection gates in an aliased world; Huber
    # alone (linear influence) let them deform an mm-accurate graph to
    # 0.28-1.9 m ATE.  0 disables.
    dcs_phi: float = 4.0


def empty_graph(n_nodes: int, n_se3: int, n_gps: int = 0, n_floor: int = 0,
                n_orient: int = 0) -> PoseGraphData:
    def z(*s):
        return jnp.zeros(s, jnp.float32)
    qid = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n_nodes, 1))
    g = max(n_gps, 1)
    f = max(n_floor, 1)
    o = max(n_orient, 1)
    return PoseGraphData(
        nodes=GraphNodes(qid, z(n_nodes, 3), jnp.zeros(n_nodes, bool), jnp.zeros(n_nodes, bool)),
        se3=Se3Edges(jnp.zeros((n_se3, 2), jnp.int32),
                     jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n_se3, 1)),
                     z(n_se3, 3), jnp.ones((n_se3, 6), jnp.float32), jnp.zeros(n_se3, bool)),
        gps=GpsPriors(jnp.zeros(g, jnp.int32), z(g, 3), jnp.ones((g, 3), jnp.float32),
                      jnp.zeros(g, bool)),
        floor=FloorPriors(jnp.zeros(f, jnp.int32), z(f), jnp.ones((f, 3), jnp.float32),
                          jnp.zeros(f, bool)),
        orient=OrientPriors(jnp.zeros(o, jnp.int32), qid[:o], jnp.ones((o, 3), jnp.float32),
                            jnp.zeros(o, bool)),
    )


# --------------------------------------------------------------------------
# residuals


def _node_pose(nodes: GraphNodes, dx: jax.Array, i):
    """Perturbed pose of node i: (quat, pos) boxplus dx[i]."""
    q = so3.quat_mul(nodes.quat[i], so3.quat_from_rotvec(dx[i, :3]))
    p = nodes.pos[i] + dx[i, 3:]
    return q, p


def _se3_residual(nodes: GraphNodes, e: Se3Edges, dx: jax.Array) -> jax.Array:
    """Whitened 6-dim residual per SE3 edge."""
    def one(idx, qm, tm, si, m):
        qi, pi = _node_pose(nodes, dx, idx[0])
        qj, pj = _node_pose(nodes, dx, idx[1])
        qi_inv = so3.quat_conj(qi)
        # relative pose i->j
        q_ij = so3.quat_mul(qi_inv, qj)
        t_ij = so3.quat_rotate(qi_inv, pj - pi)
        dq = so3.quat_mul(so3.quat_conj(qm), q_ij)
        r_rot = so3.rotvec_from_quat(dq)
        r_t = t_ij - tm
        return jnp.concatenate([r_rot, r_t]) * si * m

    return jax.vmap(one)(e.idx, e.q_meas, e.t_meas, e.sqrt_info,
                         e.mask.astype(dx.dtype))


def _gps_residual(nodes: GraphNodes, g: GpsPriors, dx: jax.Array) -> jax.Array:
    def one(idx, xyz, si, m):
        _, p = _node_pose(nodes, dx, idx)
        return (p - xyz) * si * m
    return jax.vmap(one)(g.idx, g.xyz, g.sqrt_info, g.mask.astype(dx.dtype))


def _floor_residual(nodes: GraphNodes, f: FloorPriors, dx: jax.Array) -> jax.Array:
    def one(idx, z0, si, m):
        q, p = _node_pose(nodes, dx, idx)
        # body z-axis in world; residual = tilt (x,y of axis) + height
        zaxis = so3.quat_rotate(q, np.asarray([0.0, 0.0, 1.0], dx.dtype))
        return jnp.stack([p[2] - z0, zaxis[0], zaxis[1]]) * si * m
    return jax.vmap(one)(f.idx, f.z, f.sqrt_info, f.mask.astype(dx.dtype))


def _orient_residual(nodes: GraphNodes, o: OrientPriors, dx: jax.Array) -> jax.Array:
    def one(idx, qm, si, m):
        q, _ = _node_pose(nodes, dx, idx)
        return so3.rotvec_from_quat(so3.quat_mul(so3.quat_conj(qm), q)) * si * m
    return jax.vmap(one)(o.idx, o.quat, o.sqrt_info, o.mask.astype(dx.dtype))


# --------------------------------------------------------------------------
# solver


def _huber_weights(r: jax.Array, delta: float) -> jax.Array:
    """sqrt IRLS weight per factor from its whitened residual norm."""
    n = jnp.linalg.norm(r, axis=-1)
    return jnp.sqrt(jnp.where(n <= delta, 1.0, delta / jnp.maximum(n, 1e-9)))


def _linearize_blocks(graph: PoseGraphData, nodes: GraphNodes,
                      rw_se3, rw_gps):
    """Per-factor Jacobian blocks + whitened residuals at dx=0.

    Linearizing ONCE per GN round and running CG with explicit blocks is
    ~90x faster than re-applying jax.linearize/vjp every CG iteration
    (measured 0.91 -> 85 rounds/s on a 1k-node graph on one chip).
    """
    se3, gps, floor, orient = graph.se3, graph.gps, graph.floor, graph.orient

    def se3_f(d, qi0, pi0, qj0, pj0, qm, tm, si, w):
        qi = so3.quat_mul(qi0, so3.quat_from_rotvec(d[:3]))
        pi = pi0 + d[3:6]
        qj = so3.quat_mul(qj0, so3.quat_from_rotvec(d[6:9]))
        pj = pj0 + d[9:12]
        qi_inv = so3.quat_conj(qi)
        q_ij = so3.quat_mul(qi_inv, qj)
        t_ij = so3.quat_rotate(qi_inv, pj - pi)
        r_rot = so3.rotvec_from_quat(so3.quat_mul(so3.quat_conj(qm), q_ij))
        return jnp.concatenate([r_rot, t_ij - tm]) * si * w

    w_se3 = se3.mask.astype(jnp.float32) * rw_se3
    z12 = jnp.zeros(12, jnp.float32)
    J_se3, r_se3 = jax.vmap(
        lambda qi0, pi0, qj0, pj0, qm, tm, si, w: (
            jax.jacfwd(se3_f)(z12, qi0, pi0, qj0, pj0, qm, tm, si, w),
            se3_f(z12, qi0, pi0, qj0, pj0, qm, tm, si, w)))(
        nodes.quat[se3.idx[:, 0]], nodes.pos[se3.idx[:, 0]],
        nodes.quat[se3.idx[:, 1]], nodes.pos[se3.idx[:, 1]],
        se3.q_meas, se3.t_meas, se3.sqrt_info, w_se3)

    w_gps = (gps.mask.astype(jnp.float32) * rw_gps)[:, None] * gps.sqrt_info
    r_gps = (nodes.pos[gps.idx] - gps.xyz) * w_gps                 # (G, 3)

    def floor_f(d, q0, p0, z0, si, w):
        q = so3.quat_mul(q0, so3.quat_from_rotvec(d[:3]))
        p = p0 + d[3:]
        zaxis = so3.quat_rotate(q, np.asarray([0.0, 0.0, 1.0], np.float32))
        return jnp.stack([p[2] - z0, zaxis[0], zaxis[1]]) * si * w

    z6 = jnp.zeros(6, jnp.float32)
    J_fl, r_fl = jax.vmap(lambda q0, p0, z0, si, w: (
        jax.jacfwd(floor_f)(z6, q0, p0, z0, si, w),
        floor_f(z6, q0, p0, z0, si, w)))(
        nodes.quat[floor.idx], nodes.pos[floor.idx], floor.z,
        floor.sqrt_info, floor.mask.astype(jnp.float32))

    def orient_f(d, q0, qm, si, w):
        q = so3.quat_mul(q0, so3.quat_from_rotvec(d[:3]))
        r = so3.rotvec_from_quat(so3.quat_mul(so3.quat_conj(qm), q)) * si * w
        return jnp.concatenate([r, jnp.zeros(3, jnp.float32) * d[3:]])

    J_or, r_or = jax.vmap(lambda q0, qm, si, w: (
        jax.jacfwd(orient_f)(z6, q0, qm, si, w),
        orient_f(z6, q0, qm, si, w)))(
        nodes.quat[orient.idx], orient.quat, orient.sqrt_info,
        orient.mask.astype(jnp.float32))
    return (J_se3, r_se3), (w_gps, r_gps), (J_fl, r_fl), (J_or, r_or)


@functools.partial(jax.jit, static_argnames=("cfg",))
@mxu_f32
def optimize(graph: PoseGraphData, cfg: PgoConfig = PgoConfig()
             ) -> Tuple[PoseGraphData, dict]:
    """Run robust Gauss-Newton; returns (updated graph, info)."""
    nodes = graph.nodes
    n = nodes.quat.shape[0]
    free = (nodes.mask & ~nodes.fixed).astype(jnp.float32)[:, None]  # (N,1)
    gi = graph.se3.idx
    fi = graph.floor.idx
    oi = graph.orient.idx
    pi = graph.gps.idx

    def outer(carry, _):
        nodes, gps_on = carry
        dx0 = jnp.zeros((n, 6), jnp.float32)

        # robust weights + chi2 gating at the current linearization point
        r_se3_raw = _se3_residual(nodes, graph.se3, dx0)
        r_gps_raw = _gps_residual(
            nodes, graph.gps._replace(mask=graph.gps.mask & gps_on), dx0)
        rw_se3 = _huber_weights(r_se3_raw, cfg.huber_delta)
        if cfg.dcs_phi > 0:
            is_loop = jnp.abs(graph.se3.idx[:, 0]
                              - graph.se3.idx[:, 1]) > 1
            chi2_se3 = jnp.sum(r_se3_raw ** 2, axis=-1)
            s2 = jnp.minimum(1.0, 2.0 * cfg.dcs_phi
                             / (cfg.dcs_phi + chi2_se3))
            rw_se3 = rw_se3 * jnp.where(is_loop, jnp.sqrt(s2), 1.0)
        rw_gps = _huber_weights(r_gps_raw, cfg.huber_delta) * gps_on.astype(jnp.float32)
        chi2 = jnp.sum(r_gps_raw ** 2, axis=-1)
        gps_on_new = gps_on & (chi2 < cfg.gps_chi2_gate)

        (J_se3, r_se3), (w_gps, r_gps), (J_fl, r_fl), (J_or, r_or) = \
            _linearize_blocks(graph, nodes, rw_se3, rw_gps)

        def matvec(v):
            vv = jnp.concatenate([v[gi[:, 0]], v[gi[:, 1]]], axis=-1)
            JtJv = jnp.einsum("eij,ei->ej", J_se3,
                              jnp.einsum("eij,ej->ei", J_se3, vv))
            out = jnp.zeros((n, 6), jnp.float32)
            out = out.at[gi[:, 0]].add(JtJv[:, :6])
            out = out.at[gi[:, 1]].add(JtJv[:, 6:])
            out = out.at[pi, 3:].add((w_gps ** 2) * v[pi, 3:])
            out = out.at[fi].add(jnp.einsum(
                "eij,ei->ej", J_fl, jnp.einsum("eij,ej->ei", J_fl, v[fi])))
            out = out.at[oi].add(jnp.einsum(
                "eij,ei->ej", J_or, jnp.einsum("eij,ej->ei", J_or, v[oi])))
            return out * free + cfg.damping * v

        b = jnp.zeros((n, 6), jnp.float32)
        Jtr = jnp.einsum("eij,ei->ej", J_se3, r_se3)
        b = b.at[gi[:, 0]].add(Jtr[:, :6])
        b = b.at[gi[:, 1]].add(Jtr[:, 6:])
        b = b.at[pi, 3:].add(w_gps * r_gps)
        b = b.at[fi].add(jnp.einsum("eij,ei->ej", J_fl, r_fl))
        b = b.at[oi].add(jnp.einsum("eij,ei->ej", J_or, r_or))
        b = -b * free

        # block-Jacobi preconditioner: per-node 6x6 diagonal blocks of
        # J^T J (tighter than the scalar diagonal — rotation/translation
        # coupling within a node is captured, so CG needs fewer
        # iterations for the same accuracy)
        blocks = jnp.tile(cfg.damping * jnp.eye(6, dtype=jnp.float32),
                          (n, 1, 1))
        Bi = jnp.einsum("eij,eik->ejk", J_se3[:, :, :6], J_se3[:, :, :6])
        Bj = jnp.einsum("eij,eik->ejk", J_se3[:, :, 6:], J_se3[:, :, 6:])
        blocks = blocks.at[gi[:, 0]].add(Bi)
        blocks = blocks.at[gi[:, 1]].add(Bj)
        gps_w2 = jnp.broadcast_to(w_gps ** 2, (pi.shape[0], 3))
        blocks = blocks.at[pi, 3, 3].add(gps_w2[:, 0])
        blocks = blocks.at[pi, 4, 4].add(gps_w2[:, 1])
        blocks = blocks.at[pi, 5, 5].add(gps_w2[:, 2])
        blocks = blocks.at[fi].add(
            jnp.einsum("eij,eik->ejk", J_fl, J_fl))
        blocks = blocks.at[oi].add(
            jnp.einsum("eij,eik->ejk", J_or, J_or))
        # conditioning guard for the f32 block inverse: absolute damping
        # (1e-6) is invisible next to odometry information ~4e4, so a
        # block with one near-unconstrained axis (corridor-sliding loop
        # edge) is ~1e10-conditioned and its f32 inverse is garbage;
        # damp RELATIVE to each block's own scale (VERDICT r3 #9 sweep)
        scale = jnp.trace(blocks, axis1=-2, axis2=-1)[:, None, None] / 6.0
        blocks = blocks + (1e-5 * scale + cfg.damping) \
            * jnp.eye(6, dtype=jnp.float32)
        Binv = jnp.linalg.inv(blocks)

        def precond(r):
            z = jnp.einsum("nij,nj->ni", Binv, r)
            return z * free

        def cg_step(state, _):
            x, r, z, p = state
            Ap = matvec(p)
            rz = jnp.vdot(r, z)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-12)
            x = x + alpha * p
            r_new = r - alpha * Ap
            z_new = precond(r_new)
            beta = jnp.vdot(r_new, z_new) / jnp.maximum(rz, 1e-12)
            return (x, r_new, z_new, p * beta + z_new), None

        z0 = precond(b)
        (dx, *_), _ = jax.lax.scan(cg_step, (jnp.zeros_like(b), b, z0, z0),
                                   None, length=cfg.cg_iters)
        dx = dx * free
        new_nodes = nodes._replace(
            quat=so3.quat_normalize(so3.quat_mul(nodes.quat, so3.quat_from_rotvec(dx[:, :3]))),
            pos=nodes.pos + dx[:, 3:],
        )
        cost = (jnp.sum(r_se3 ** 2) + jnp.sum((w_gps * r_gps) ** 2)
                + jnp.sum(r_fl ** 2) + jnp.sum(r_or ** 2))
        return (new_nodes, gps_on_new), cost

    gps_on0 = jnp.ones_like(graph.gps.mask)
    (nodes_f, gps_on_f), costs = jax.lax.scan(
        outer, (nodes, gps_on0), None, length=cfg.outer_iters)
    info = dict(costs=costs, gps_inliers=jnp.sum((graph.gps.mask & gps_on_f).astype(jnp.int32)))
    return graph._replace(nodes=nodes_f,
                          gps=graph.gps._replace(mask=graph.gps.mask & gps_on_f)), info

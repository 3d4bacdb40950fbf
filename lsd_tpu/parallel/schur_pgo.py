"""Distributed pose-graph optimization by Schur-complement reduction over
keyframe ownership — the north-star scale-out solver (BASELINE.json;
VERDICT.md round-2 item 4).

Partitioning (host-side plan, like the reference's g2o graph assembly —
slam/backend/graph_slam.cpp — but for a device mesh):
  - nodes are split into ``ndev`` contiguous keyframe ranges (chunks);
    contiguity = trajectory locality, so almost all odometry edges are
    chunk-internal;
  - every edge whose endpoints live in different chunks is a CUT edge;
    the union of cut-edge endpoints is the SEPARATOR set;
  - edges touching an interior node are necessarily chunk-internal (a
    cross-chunk edge makes both endpoints separators), so each device
    owns exactly the factors of its chunk; separator-separator factors
    are distributed round-robin and reduced with ``psum``.

Solve (exact Gauss-Newton step per outer iteration, not truncated CG):
  each device assembles a DENSE local Hessian over its extended index
  space [interior slots | separator slots] — dense block linear algebra
  is what the MXU wants — then eliminates its interiors with a local
  Cholesky:   S_d = H_ss_d - H_si H_ii^{-1} H_is
  The tiny separator system  (psum_d S_d) dx_s = psum_d rhs_d  is solved
  replicated; interiors back-substitute locally.  Communication per GN
  round is one psum of (S*6)^2 + (S*6) floats — the Schur-block
  reduction over ICI demanded by SURVEY.md §2.5.

Semantics match slam/posegraph.py ``optimize``: Huber IRLS weights,
GNSS chi2 gating with the gate state carried across outer iterations,
and ALL factor types (SE3, GPS, floor, orientation) — closing the
floor/orient gap of the factor-sharded CG path (sharded_pgo.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import so3
from ..slam.posegraph import (GraphNodes, PgoConfig, PoseGraphData,
                              _gps_residual, _huber_weights, _se3_residual)
from ..utils.precision import mxu_f32


def _bucket(x: int, lo: int = 8) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


class SchurPlan(NamedTuple):
    """Host-built partition plan (numpy); static shapes per bucket."""
    ndev: int
    m_int: int                 # interior slots per device
    n_sep: int                 # separator slots (shared)
    int_ids: np.ndarray        # (ndev, m_int) global node id (0 pad)
    int_mask: np.ndarray       # (ndev, m_int)
    sep_ids: np.ndarray        # (n_sep,) global node id
    sep_mask: np.ndarray       # (n_sep,)
    e_rows: np.ndarray         # (ndev, E_loc) row into graph.se3 (0 pad)
    e_slots: np.ndarray        # (ndev, E_loc, 2) extended-space slots
    e_mask: np.ndarray         # (ndev, E_loc)
    g_rows: np.ndarray         # (ndev, G_loc) row into graph.gps
    g_slots: np.ndarray        # (ndev, G_loc)
    g_mask: np.ndarray         # (ndev, G_loc)
    f_rows: np.ndarray         # (ndev, F_loc)
    f_slots: np.ndarray
    f_mask: np.ndarray
    o_rows: np.ndarray         # (ndev, O_loc)
    o_slots: np.ndarray
    o_mask: np.ndarray


def build_plan(graph: PoseGraphData, ndev: int) -> SchurPlan:
    node_mask = np.asarray(graph.nodes.mask)
    used = np.flatnonzero(node_mask)
    n_used = len(used)
    m_chunk = -(-max(n_used, 1) // ndev)
    chunk_of = np.full(node_mask.shape[0], -1, np.int64)
    chunk_of[used] = np.arange(n_used) // m_chunk

    eidx = np.asarray(graph.se3.idx)
    emask = np.asarray(graph.se3.mask)
    ci = chunk_of[eidx[:, 0]]
    cj = chunk_of[eidx[:, 1]]
    cut = emask & (ci != cj)
    sep_ids = np.unique(eidx[cut].ravel()) if cut.any() else np.zeros(0, np.int64)
    is_sep = np.zeros(node_mask.shape[0], bool)
    is_sep[sep_ids] = True

    n_sep = _bucket(max(len(sep_ids), 1))
    sep_pad = np.zeros(n_sep, np.int64)
    sep_pad[:len(sep_ids)] = sep_ids
    sep_mask = np.zeros(n_sep, bool)
    sep_mask[:len(sep_ids)] = True
    sep_slot_of = np.full(node_mask.shape[0], -1, np.int64)
    sep_slot_of[sep_ids] = np.arange(len(sep_ids))

    # interior lists per chunk
    m_int = _bucket(m_chunk)
    int_ids = np.zeros((ndev, m_int), np.int64)
    int_mask = np.zeros((ndev, m_int), bool)
    int_slot_of = np.full(node_mask.shape[0], -1, np.int64)
    for d in range(ndev):
        ids = used[d * m_chunk:(d + 1) * m_chunk]
        ids = ids[~is_sep[ids]]
        int_ids[d, :len(ids)] = ids
        int_mask[d, :len(ids)] = True
        int_slot_of[ids] = np.arange(len(ids))

    def ext_slot(node: np.ndarray) -> np.ndarray:
        """Extended-space slot of a node within its owner device."""
        return np.where(is_sep[node], m_int + sep_slot_of[node],
                        int_slot_of[node])

    # ---- assign SE3 edges ------------------------------------------------
    own = np.where(cut | ~emask, -1, np.where(is_sep[eidx[:, 0]], cj, ci))
    # sep-sep (cut or intra-chunk between two separators): round-robin
    both_sep = emask & is_sep[eidx[:, 0]] & is_sep[eidx[:, 1]]
    rr = np.cumsum(both_sep) % ndev
    own = np.where(both_sep, rr, own)
    # intra-chunk edge with one separator endpoint: the interior side owns
    one_int = emask & ~both_sep
    own = np.where(one_int & is_sep[eidx[:, 0]], cj, own)
    own = np.where(one_int & ~is_sep[eidx[:, 0]], ci, own)

    rows_per = [np.flatnonzero(emask & (own == d)) for d in range(ndev)]
    E_loc = _bucket(max([1] + [len(r) for r in rows_per]))
    e_rows = np.zeros((ndev, E_loc), np.int64)
    e_slots = np.zeros((ndev, E_loc, 2), np.int64)
    e_mask = np.zeros((ndev, E_loc), bool)
    for d, r in enumerate(rows_per):
        e_rows[d, :len(r)] = r
        e_slots[d, :len(r), 0] = ext_slot(eidx[r, 0])
        e_slots[d, :len(r), 1] = ext_slot(eidx[r, 1])
        e_mask[d, :len(r)] = True

    # ---- node-local priors: owner = node's chunk --------------------------
    def prior_plan(idx, mask):
        idx = np.asarray(idx)
        mask = np.asarray(mask) & node_mask[idx]
        owner = np.where(is_sep[idx], chunk_of[idx], chunk_of[idx])
        rows_per = [np.flatnonzero(mask & (owner == d)) for d in range(ndev)]
        cap = _bucket(max([1] + [len(r) for r in rows_per]), lo=4)
        rows = np.zeros((ndev, cap), np.int64)
        slots = np.zeros((ndev, cap), np.int64)
        msk = np.zeros((ndev, cap), bool)
        for d, r in enumerate(rows_per):
            rows[d, :len(r)] = r
            slots[d, :len(r)] = ext_slot(idx[r])
            msk[d, :len(r)] = True
        return rows, slots, msk

    g_rows, g_slots, g_mask = prior_plan(graph.gps.idx, graph.gps.mask)
    f_rows, f_slots, f_mask = prior_plan(graph.floor.idx, graph.floor.mask)
    o_rows, o_slots, o_mask = prior_plan(graph.orient.idx, graph.orient.mask)

    return SchurPlan(ndev=ndev, m_int=m_int, n_sep=n_sep,
                     int_ids=int_ids, int_mask=int_mask,
                     sep_ids=sep_pad, sep_mask=sep_mask,
                     e_rows=e_rows, e_slots=e_slots, e_mask=e_mask,
                     g_rows=g_rows, g_slots=g_slots, g_mask=g_mask,
                     f_rows=f_rows, f_slots=f_slots, f_mask=f_mask,
                     o_rows=o_rows, o_slots=o_slots, o_mask=o_mask)


@functools.lru_cache(maxsize=16)
def _build_round(mesh: Mesh, cfg: PgoConfig, m_int: int, n_sep: int,
                 E_loc: int, G_loc: int, F_loc: int, O_loc: int, n: int):
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    m_ext = m_int + n_sep

    @jax.jit
    @mxu_f32
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(),                      # nodes, gps_on, free
                  P(axis), P(axis),                   # int_ids, int_mask
                  P(), P(),                           # sep_ids, sep_mask
                  P(axis), P(axis), P(axis),          # edges rows/slots/mask
                  P(axis), P(axis), P(axis),          # gps
                  P(axis), P(axis), P(axis),          # floor
                  P(axis), P(axis), P(axis),          # orient
                  P(), P(), P(), P()),                # graph factor tables
        out_specs=(P(), P()),
    )
    def gn_round(nodes: GraphNodes, gps_on, free,
                 int_ids, int_mask, sep_ids, sep_mask,
                 e_rows, e_slots, e_mask,
                 g_rows, g_slots, g_mask,
                 f_rows, f_slots, f_mask,
                 o_rows, o_slots, o_mask,
                 se3, gps, floor, orient):
        int_ids, int_mask = int_ids[0], int_mask[0]
        e_rows, e_slots, e_mask = e_rows[0], e_slots[0], e_mask[0]
        g_rows, g_slots, g_mask = g_rows[0], g_slots[0], g_mask[0]
        f_rows, f_slots, f_mask = f_rows[0], f_slots[0], f_mask[0]
        o_rows, o_slots, o_mask = o_rows[0], o_slots[0], o_mask[0]

        f32 = jnp.float32
        # ---- robust weights + chi2 gate (replicated; tiny) --------------
        dx0 = jnp.zeros((n, 6), f32)
        r_se3_raw = _se3_residual(nodes, se3, dx0)
        rw_se3_all = _huber_weights(r_se3_raw, cfg.huber_delta)
        if cfg.dcs_phi > 0:
            # Dynamic Covariance Scaling on loop/cross edges — identical
            # semantics to the single-host solver (posegraph.optimize)
            is_loop = jnp.abs(se3.idx[:, 0] - se3.idx[:, 1]) > 1
            chi2_se3 = jnp.sum(r_se3_raw ** 2, axis=-1)
            s2 = jnp.minimum(1.0, 2.0 * cfg.dcs_phi
                             / (cfg.dcs_phi + chi2_se3))
            rw_se3_all = rw_se3_all * jnp.where(is_loop, jnp.sqrt(s2), 1.0)
        r_gps_raw = _gps_residual(
            nodes, gps._replace(mask=gps.mask & gps_on), dx0)
        rw_gps_all = (_huber_weights(r_gps_raw, cfg.huber_delta)
                      * gps_on.astype(f32))
        chi2 = jnp.sum(r_gps_raw ** 2, axis=-1)
        gps_on_new = gps_on & (chi2 < cfg.gps_chi2_gate)

        # ---- linearize THIS device's factors ----------------------------
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

        ei = se3.idx[e_rows]                              # (E_loc, 2)
        w_e = (e_mask & se3.mask[e_rows]).astype(f32) * rw_se3_all[e_rows]
        z12 = jnp.zeros(12, f32)
        J_e, r_e = jax.vmap(lambda qi0, pi0, qj0, pj0, qm, tm, si, w: (
            jax.jacfwd(se3_f)(z12, qi0, pi0, qj0, pj0, qm, tm, si, w),
            se3_f(z12, qi0, pi0, qj0, pj0, qm, tm, si, w)))(
            nodes.quat[ei[:, 0]], nodes.pos[ei[:, 0]],
            nodes.quat[ei[:, 1]], nodes.pos[ei[:, 1]],
            se3.q_meas[e_rows], se3.t_meas[e_rows], se3.sqrt_info[e_rows],
            w_e)

        # ---- assemble dense extended Hessian -----------------------------
        H = jnp.zeros((m_ext, m_ext, 6, 6), f32)
        b = jnp.zeros((m_ext, 6), f32)
        a_s, b_s_ = e_slots[:, 0], e_slots[:, 1]
        Ji, Jj = J_e[:, :, :6], J_e[:, :, 6:]
        H = H.at[a_s, a_s].add(jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[a_s, b_s_].add(jnp.einsum("eki,ekj->eij", Ji, Jj))
        H = H.at[b_s_, a_s].add(jnp.einsum("eki,ekj->eij", Jj, Ji))
        H = H.at[b_s_, b_s_].add(jnp.einsum("eki,ekj->eij", Jj, Jj))
        b = b.at[a_s].add(jnp.einsum("eki,ek->ei", Ji, r_e))
        b = b.at[b_s_].add(jnp.einsum("eki,ek->ei", Jj, r_e))

        # GPS priors (translation only)
        wg = ((g_mask & gps.mask[g_rows]).astype(f32)
              * rw_gps_all[g_rows])[:, None] * gps.sqrt_info[g_rows]
        r_g = (nodes.pos[gps.idx[g_rows]] - gps.xyz[g_rows]) * wg
        gblk = jnp.zeros((g_rows.shape[0], 6, 6), f32)
        gblk = gblk.at[:, 3, 3].set(wg[:, 0] ** 2)
        gblk = gblk.at[:, 4, 4].set(wg[:, 1] ** 2)
        gblk = gblk.at[:, 5, 5].set(wg[:, 2] ** 2)
        H = H.at[g_slots, g_slots].add(gblk)
        b = b.at[g_slots, 3:].add(wg * r_g)

        # floor priors
        def floor_f(d, q0, p0, z0, si, w):
            q = so3.quat_mul(q0, so3.quat_from_rotvec(d[:3]))
            p = p0 + d[3:]
            za = so3.quat_rotate(q, np.asarray([0.0, 0.0, 1.0], np.float32))
            return jnp.stack([p[2] - z0, za[0], za[1]]) * si * w

        z6 = jnp.zeros(6, f32)
        wf = (f_mask & floor.mask[f_rows]).astype(f32)
        J_f, r_f = jax.vmap(lambda q0, p0, z0, si, w: (
            jax.jacfwd(floor_f)(z6, q0, p0, z0, si, w),
            floor_f(z6, q0, p0, z0, si, w)))(
            nodes.quat[floor.idx[f_rows]], nodes.pos[floor.idx[f_rows]],
            floor.z[f_rows], floor.sqrt_info[f_rows], wf)
        H = H.at[f_slots, f_slots].add(jnp.einsum("eki,ekj->eij", J_f, J_f))
        b = b.at[f_slots].add(jnp.einsum("eki,ek->ei", J_f, r_f))

        # orientation priors
        def orient_f(d, q0, qm, si, w):
            q = so3.quat_mul(q0, so3.quat_from_rotvec(d[:3]))
            return so3.rotvec_from_quat(
                so3.quat_mul(so3.quat_conj(qm), q)) * si * w

        wo = (o_mask & orient.mask[o_rows]).astype(f32)
        J_o, r_o = jax.vmap(lambda q0, qm, si, w: (
            jax.jacfwd(orient_f)(z6[:6], q0, qm, si, w),
            orient_f(z6[:6], q0, qm, si, w)))(
            nodes.quat[orient.idx[o_rows]], orient.quat[o_rows],
            orient.sqrt_info[o_rows], wo)
        H = H.at[o_slots, o_slots].add(jnp.einsum("eki,ekj->eij", J_o, J_o))
        b = b.at[o_slots].add(jnp.einsum("eki,ek->ei", J_o, r_o))

        b = -b

        # ---- free/fixed masking over extended slots ----------------------
        ext_free = jnp.concatenate([
            int_mask & (free[int_ids] > 0),
            sep_mask & (free[sep_ids] > 0)]).astype(f32)
        H = H * ext_free[:, None, None, None] * ext_free[None, :, None, None]
        b = b * ext_free[:, None]

        # ---- Schur elimination of interiors ------------------------------
        Hd = H.transpose(0, 2, 1, 3).reshape(m_ext * 6, m_ext * 6)
        bd = b.reshape(m_ext * 6)
        k = m_int * 6
        # pinned slots (padding / fixed interiors) get unit diagonal
        pin = 1.0 - jnp.repeat(ext_free[:m_int], 6)
        H_ii = Hd[:k, :k] + jnp.diag(pin)
        H_is = Hd[:k, k:]
        H_ss = Hd[k:, k:]
        b_i = bd[:k]
        b_s = bd[k:]
        # symmetric Jacobi scaling before the f32 Cholesky: edge
        # information spans 1e0 (soft loop axes) .. 4e4 (odometry), and an
        # unscaled f32 factorization of the chain-structured interior
        # block loses positive-definiteness at campaign scale (1192-node
        # merge produced NaN poses).  H_ii^{-1} = D^-1/2 Hn^-1 D^-1/2 with
        # Hn = D^-1/2 H_ii D^-1/2 (unit diagonal, condition ~sqrt smaller)
        # + RELATIVE damping, which absolute 1e-6 damping is not at 4e4.
        dsc = jnp.sqrt(jnp.maximum(jnp.diag(H_ii), 1e-8))
        Hn = H_ii / dsc[:, None] / dsc[None, :] \
            + (cfg.damping + 1e-6) * jnp.eye(k, dtype=f32)
        c, low = jax.scipy.linalg.cho_factor(Hn)
        X = jax.scipy.linalg.cho_solve((c, low), H_is / dsc[:, None]) \
            / dsc[:, None]                                   # H_ii^{-1} H_is
        y = jax.scipy.linalg.cho_solve((c, low), b_i / dsc) / dsc
        S_d = H_ss - H_is.T @ X
        rhs_d = b_s - H_is.T @ y

        S = jax.lax.psum(S_d, axis)
        rhs = jax.lax.psum(rhs_d, axis)
        sep_free = jnp.repeat(ext_free[m_int:], 6)
        S = (S * sep_free[:, None] * sep_free[None, :]
             + jnp.diag(1.0 - sep_free))
        dsep = jnp.sqrt(jnp.maximum(jnp.diag(S), 1e-8))
        Sn = S / dsep[:, None] / dsep[None, :] \
            + (cfg.damping + 1e-6) * jnp.eye(n_sep * 6, dtype=f32)
        dx_s = jnp.linalg.solve(Sn, (rhs * sep_free) / dsep) / dsep
        dx_s = dx_s * sep_free

        # back-substitute interiors
        dx_i = y - X @ dx_s
        dx_i = dx_i * jnp.repeat(ext_free[:m_int], 6)

        # ---- scatter to global (n, 6): psum combines device interiors ----
        out = jnp.zeros((n, 6), f32)
        out = out.at[jnp.where(int_mask, int_ids, n)].add(
            dx_i.reshape(m_int, 6), mode="drop")
        out = out.at[jnp.where(sep_mask, sep_ids, n)].add(
            dx_s.reshape(n_sep, 6) / ndev, mode="drop")
        dx = jax.lax.psum(out, axis)
        new_nodes = nodes._replace(
            quat=so3.quat_normalize(so3.quat_mul(
                nodes.quat, so3.quat_from_rotvec(dx[:, :3]))),
            pos=nodes.pos + dx[:, 3:])
        return new_nodes, gps_on_new

    return gn_round


def optimize_schur(graph: PoseGraphData, mesh: Mesh,
                   cfg: PgoConfig = PgoConfig()
                   ) -> Tuple[PoseGraphData, dict]:
    """Distributed robust GN via Schur-complement reduction.  Full factor
    set + GNSS gating; exact step per outer iteration."""
    ndev = mesh.devices.size
    plan = build_plan(graph, ndev)
    n = graph.nodes.quat.shape[0]
    free = (graph.nodes.mask & ~graph.nodes.fixed).astype(jnp.float32)
    rnd = _build_round(mesh, cfg, plan.m_int, plan.n_sep,
                       plan.e_rows.shape[1], plan.g_rows.shape[1],
                       plan.f_rows.shape[1], plan.o_rows.shape[1], n)
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))
    dev = lambda a: jax.device_put(jnp.asarray(a), shard)
    args_static = (
        dev(plan.int_ids.astype(np.int32)), dev(plan.int_mask),
        jnp.asarray(plan.sep_ids.astype(np.int32)), jnp.asarray(plan.sep_mask),
        dev(plan.e_rows.astype(np.int32)), dev(plan.e_slots.astype(np.int32)),
        dev(plan.e_mask),
        dev(plan.g_rows.astype(np.int32)), dev(plan.g_slots.astype(np.int32)),
        dev(plan.g_mask),
        dev(plan.f_rows.astype(np.int32)), dev(plan.f_slots.astype(np.int32)),
        dev(plan.f_mask),
        dev(plan.o_rows.astype(np.int32)), dev(plan.o_slots.astype(np.int32)),
        dev(plan.o_mask),
    )
    nodes = graph.nodes
    gps_on = jnp.ones_like(graph.gps.mask)
    # per-round wall split: the jitted GN round is lru_cached, so round 0
    # carries the one-time XLA compile (the bulk of the r3 campaign's
    # 30.5 s merge wall on the virtual CPU mesh); steady-state rounds are
    # the true solve cost.  Reported so the artifact can say where the
    # time goes (VERDICT r3 #7).
    import time as _time
    round_s = []
    for _ in range(cfg.outer_iters):
        t0 = _time.perf_counter()
        nodes, gps_on = rnd(nodes, gps_on, free, *args_static,
                            graph.se3, graph.gps, graph.floor, graph.orient)
        jax.block_until_ready(nodes.pos)
        round_s.append(_time.perf_counter() - t0)
    steady = round_s[1:] or round_s
    info = dict(gps_inliers=jnp.sum((graph.gps.mask & gps_on).astype(jnp.int32)),
                n_sep=int(plan.sep_mask.sum()),
                compile_plus_first_round_s=round(round_s[0], 3),
                solve_round_ms=round(1e3 * sum(steady) / len(steady), 2),
                solve_total_s=round(sum(steady), 3))
    return graph._replace(
        nodes=nodes, gps=graph.gps._replace(mask=graph.gps.mask & gps_on)), info

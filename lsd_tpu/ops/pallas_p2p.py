"""Pallas TPU kernel: fused point-to-plane measurement reduction.

The LIO iterate's inner op (SURVEY.md hot loop (a); reference:
slam/mapping/fastlio/src/laserMapping.cpp:813-983 h_share_model) computed
via XLA builds an (N, 24) Jacobian in HBM and runs several elementwise
kernels plus two matmuls.  This kernel fuses the whole measurement system
— body/world transform, residual, FAST-LIO validity gate, Jacobian rows,
and the weighted Gauss-Newton reduction — into one VMEM-resident pass:

    inputs  (8, N) structure-of-arrays f32:
        rows 0:3  point in lidar frame (x, y, z)
        rows 3:6  plane normal (world)
        row  6    plane offset d  (plane: n.x + d = 0)
        row  7    weight = mask * inv_var (0 disables the point)
    output  (16, 128) f32, cols 0:13 used:
        [:12, :12]  J^T W J   (rows 0:3 d/dp, 3:6 d/dtheta,
                               6:9 d/dtheta_ext, 9:12 d/dt_ext)
        [:12, 12]   J^T W r
        [12, 13]    sum of valid weights (diagnostics)
        [13, 13]    sum |r| * valid      (diagnostics)
        [14, 13]    count of valid points

Grid iterates over N/TILE point tiles accumulating into the same output
block; the J^T J contraction runs on the MXU via dot_general over the
tile dimension.  Set ``interpret=True`` off-TPU (tests).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024
ROWS = 8          # input SoA rows
JROWS = 16        # padded Jacobian rows (12 used)


def _kernel(params_ref, data_ref, out_ref):
    # params (SMEM row vector): R (9), Re (9), te (3), pos (3),
    # max_resid, est_ext flag  — total 26 slots in a (1, 32) block
    P = params_ref
    R = [[P[0, 3 * i + j] for j in range(3)] for i in range(3)]
    Re = [[P[0, 9 + 3 * i + j] for j in range(3)] for i in range(3)]
    te = [P[0, 18 + i] for i in range(3)]
    pos = [P[0, 21 + i] for i in range(3)]
    max_resid = P[0, 24]
    est_ext = P[0, 25]

    d = data_ref[:]                       # (ROWS, TILE)
    pl_x, pl_y, pl_z = d[0], d[1], d[2]
    nx, ny, nz = d[3], d[4], d[5]
    dpl = d[6]
    w_in = d[7]

    # body (IMU) frame: pb = Re pl + te
    pbx = Re[0][0] * pl_x + Re[0][1] * pl_y + Re[0][2] * pl_z + te[0]
    pby = Re[1][0] * pl_x + Re[1][1] * pl_y + Re[1][2] * pl_z + te[1]
    pbz = Re[2][0] * pl_x + Re[2][1] * pl_y + Re[2][2] * pl_z + te[2]
    # world: pw = R pb + pos
    pwx = R[0][0] * pbx + R[0][1] * pby + R[0][2] * pbz + pos[0]
    pwy = R[1][0] * pbx + R[1][1] * pby + R[1][2] * pbz + pos[1]
    pwz = R[2][0] * pbx + R[2][1] * pby + R[2][2] * pbz + pos[2]

    r = nx * pwx + ny * pwy + nz * pwz + dpl

    # FAST-LIO validity gate: s = 1 - 0.9 |r| / sqrt(|p_l|) > 0.9
    pnorm = jnp.sqrt(pl_x * pl_x + pl_y * pl_y + pl_z * pl_z)
    s = 1.0 - 0.9 * jnp.abs(r) / jnp.sqrt(jnp.maximum(pnorm, 1e-3))
    valid = (w_in > 0.0) & (s > 0.9) & (jnp.abs(r) < max_resid)
    w = jnp.where(valid, w_in, 0.0)

    # n^T R  (range-direction row used by the rotation/extrinsic blocks)
    nRx = nx * R[0][0] + ny * R[1][0] + nz * R[2][0]
    nRy = nx * R[0][1] + ny * R[1][1] + nz * R[2][1]
    nRz = nx * R[0][2] + ny * R[1][2] + nz * R[2][2]
    # d r / d theta = -(nR) x pb
    jt_x = -(nRy * pbz - nRz * pby)
    jt_y = -(nRz * pbx - nRx * pbz)
    jt_z = -(nRx * pby - nRy * pbx)
    # extrinsic rotation block: -(nR Re) x pl   (zeroed unless est_ext)
    nRRex = nRx * Re[0][0] + nRy * Re[1][0] + nRz * Re[2][0]
    nRRey = nRx * Re[0][1] + nRy * Re[1][1] + nRz * Re[2][1]
    nRRez = nRx * Re[0][2] + nRy * Re[1][2] + nRz * Re[2][2]
    je_x = -(nRRey * pl_z - nRRez * pl_y) * est_ext
    je_y = -(nRRez * pl_x - nRRex * pl_z) * est_ext
    je_z = -(nRRex * pl_y - nRRey * pl_x) * est_ext

    zero = jnp.zeros_like(r)
    one = jnp.ones_like(r)
    vf = jnp.where(valid, 1.0, 0.0)
    jrows = [nx, ny, nz, jt_x, jt_y, jt_z,
             je_x, je_y, je_z, nRx * est_ext, nRy * est_ext, nRz * est_ext]
    # left rows: weighted Jacobian, then diagnostic rows
    left = jnp.stack([jr * w for jr in jrows] + [vf, vf * jnp.abs(r), w, zero])
    # right rows: raw Jacobian, residual, ones
    right = jnp.stack(jrows + [r, one, zero, zero])
    # G = left @ right^T on the MXU:
    #   G[:12, :12] = J^T W J     G[:12, 12] = J^T W r
    #   G[12, 13] = n_valid       G[13, 13] = sum valid*|r|
    #   G[14, 13] = sum_w
    G = jax.lax.dot_general(left, right,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    G_pad = jnp.pad(G, ((0, 0), (0, 128 - JROWS)))

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] = out_ref[:] + G_pad


@functools.partial(jax.jit, static_argnames=("est_extrinsic", "interpret"))
def p2p_reduce(pts_l: jax.Array, normals: jax.Array, d: jax.Array,
               weight: jax.Array, R: jax.Array, Re: jax.Array,
               te: jax.Array, pos: jax.Array, max_resid: float,
               est_extrinsic: bool = False, interpret: bool = False
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused measurement reduction.

    pts_l (N, 3) lidar-frame points; normals (N, 3) + d (N,) world planes;
    weight (N,) = mask * inv_var.  Returns (HtH (24, 24), Htr (24,),
    stats (3,) = [sum_w, sum w*|r| -> mean via /sum_w, n_valid]).
    """
    n = pts_l.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    pad = n_pad - n

    soa = jnp.concatenate([
        pts_l.T.astype(jnp.float32),
        normals.T.astype(jnp.float32),
        d[None, :].astype(jnp.float32),
        weight[None, :].astype(jnp.float32),
    ], axis=0)                                          # (8, N)
    if pad:
        soa = jnp.pad(soa, ((0, 0), (0, pad)))

    params = jnp.concatenate([
        R.reshape(-1), Re.reshape(-1), te.reshape(-1), pos.reshape(-1),
        jnp.asarray([max_resid, 1.0 if est_extrinsic else 0.0],
                    jnp.float32),
        jnp.zeros(6, jnp.float32),
    ]).reshape(1, 32).astype(jnp.float32)

    grid = n_pad // TILE
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((JROWS, 128), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 32), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((JROWS, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(params, soa)

    G12 = out[:12, :12]
    Htr12 = out[:12, 12]
    n_valid = out[12, 13]
    sum_abs_r = out[13, 13]
    sum_w = out[14, 13]

    # scatter the 12 active rows into the 24-dim error-state layout:
    # rows 0:6 -> pose block 0:6; rows 6:12 -> extrinsic block 18:24
    idx = np.asarray([0, 1, 2, 3, 4, 5, 18, 19, 20, 21, 22, 23])
    HtH = jnp.zeros((24, 24), jnp.float32)
    HtH = HtH.at[np.ix_(idx, idx)].set(G12)
    Htr = jnp.zeros((24,), jnp.float32).at[idx].set(Htr12)
    stats = jnp.stack([n_valid, sum_abs_r, sum_w])
    return HtH, Htr, stats

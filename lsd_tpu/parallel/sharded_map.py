"""Map-block sharded LIO: the surfel map itself lives SHARDED across the
mesh — each device owns a deterministic hash-partition of the voxels and
stores them in its own open-addressed local table of capacity C/ndev.
Total map capacity scales linearly with devices (the round-2 north-star
requirement; VERDICT.md item 4 — replaces the replicated-map spec of
sharded_lio.py:41).

Why no halo exchange is needed: the surfel map stores *additive* Gaussian
moments per voxel (ops/surfel.py).  A query's 7-voxel neighborhood merge
is a sum of translated moments, so each device sums the neighbors it OWNS
(zeros elsewhere) and one ``psum`` of the (N, 10) partial moments
reconstructs the exact full-map merge — cheaper and simpler than
replicating boundary blocks, and bit-equivalent up to float-sum order.

Communication per scan step (N = ds_capacity residual points):
    psum (N, 10) f32 partial moments            ~0.6 MB  (once; planes are
                                                 then replicated)
    psum (24, 24)+(24,) f32 information matrix  ~2.3 KB  per GN iteration
Point compute (the N x 24 Jacobian/HtH matmuls) is sharded over devices by
static point-range slicing; map memory AND map-query gathers are sharded
by voxel ownership.

Reference semantics preserved: ESIKF iterate with degeneracy eigen-gating
(laserMapping.cpp:934-983); plane re-search is intentionally fixed to
once-per-scan here because a data-dependent ``lax.cond`` around a
collective is not SPMD-safe.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.hashmap import _hash_coords
from ..ops.surfel import (SurfelMap, planes_from_moments, surfel_create,
                          surfel_insert, surfel_neighborhood_moments,
                          surfel_trim, _FACE_OFFSETS)
from ..ops.voxelize import voxel_downsample
from ..slam.imu import propagate, undistort
from ..slam.lio import (LioConfig, LioState, _gate_degenerate, _update_mask,
                        lio_init)
from ..slam.state import ERR_DIM, boxminus, boxplus
from ..utils.precision import mxu_f32

_OWNER_SEED = 0xA511E9B3


def _owner_of(coords: jax.Array, ndev: int) -> jax.Array:
    """Deterministic voxel-coord -> device owner (uniform via murmur mix)."""
    return (_hash_coords(coords, _OWNER_SEED) % jnp.uint32(ndev)).astype(jnp.int32)


def sharded_lio_init(cfg: LioConfig, mesh: Mesh, nav=None) -> LioState:
    """LioState whose surfel map arrays are sharded along capacity over the
    mesh's first axis; everything else replicated."""
    assert cfg.map_type == "surfel"
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    assert cfg.map_capacity % ndev == 0
    st = lio_init(cfg, nav)
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    m: SurfelMap = st.map
    m = SurfelMap(
        keys=jax.device_put(m.keys, shard),
        coords=tuple(jax.device_put(c, shard) for c in m.coords),
        moments=tuple(jax.device_put(mm, shard) for mm in m.moments),
        voxel_size=jax.device_put(m.voxel_size, repl),
    )
    st = st._replace(map=m)
    return jax.tree.map(
        lambda a: a if isinstance(a, jax.Array) and a.sharding == shard
        else jax.device_put(a, repl), st)


def make_sharded_lio_step(cfg: LioConfig, mesh: Mesh):
    """Build the jitted map-sharded scan step: (st, points, stamps, mask,
    imu, imu_mask) -> (st, pose).  Call with a state from
    ``sharded_lio_init``."""
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    upd_mask = _update_mask(cfg)
    n_loc = cfg.ds_capacity // ndev
    assert cfg.ds_capacity % ndev == 0

    map_spec = SurfelMap(keys=P(axis), coords=(P(axis),) * 3,
                         moments=(P(axis),) * 10, voxel_size=P())
    st_spec = LioState(nav=P(), P=P(), map=map_spec, map_center=P(),
                       initialized=P(), step_count=P())

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(st_spec, P(), P(), P(), P(), P()),
        out_specs=(st_spec, P()),
    )
    def step(st: LioState, points, stamps, mask, imu, imu_mask):
        me = jax.lax.axis_index(axis)
        local_map: SurfelMap = st.map

        # ---- replicated front-end (identical on every device) ----------
        nav_prop, P_prop, track = propagate(st.nav, st.P, imu, imu_mask,
                                            cfg.imu_noise, cfg.acc_scale)
        pts_und = undistort(points[:, :3], stamps, mask, nav_prop, track)
        ds_pts, ds_mask = voxel_downsample(pts_und, mask, cfg.scan_voxel,
                                           cfg.ds_capacity)
        ds_pts = ds_pts[:, :3]

        P_inv = jnp.linalg.inv(P_prop + 1e-9 * jnp.eye(ERR_DIM))

        # ---- plane association: owned-neighbor partial moments + psum --
        def match(nav_i):
            pw = ((ds_pts @ nav_i.ext_rot.T + nav_i.ext_t)
                  @ nav_i.rot.T + nav_i.pos)
            base = jnp.floor(pw / local_map.voxel_size).astype(jnp.int32)
            ncoords = base[:, None, :] + _FACE_OFFSETS[None, :, :]
            own = _owner_of(ncoords, ndev) == me
            partial = surfel_neighborhood_moments(local_map, pw,
                                                  neighbor_mask=own)
            merged = jax.lax.psum(partial, axis)
            return pw, planes_from_moments(merged, pw, local_map.voxel_size,
                                           ds_mask, cfg.plane_thresh)

        pw0, planes = match(nav_prop)

        # ---- iterated update: point-range-sharded information build ----
        i0 = me * n_loc
        my_pts = jax.lax.dynamic_slice_in_dim(ds_pts, i0, n_loc)
        my_mask = jax.lax.dynamic_slice_in_dim(ds_mask, i0, n_loc)
        my_normals = jax.lax.dynamic_slice_in_dim(planes[0], i0, n_loc)
        my_d = jax.lax.dynamic_slice_in_dim(planes[1], i0, n_loc)
        my_ok = jax.lax.dynamic_slice_in_dim(planes[2], i0, n_loc)
        my_rms = jax.lax.dynamic_slice_in_dim(planes[3], i0, n_loc)

        def iterate(_, carry):
            nav_i, _ = carry
            R, Re = nav_i.rot, nav_i.ext_rot
            pb = my_pts @ Re.T + nav_i.ext_t
            pw = pb @ R.T + nav_i.pos
            r = jnp.einsum("ni,ni->n", pw, my_normals) + my_d
            pnorm = jnp.linalg.norm(my_pts, axis=-1)
            s = 1.0 - 0.9 * jnp.abs(r) / jnp.sqrt(jnp.maximum(pnorm, 1e-3))
            valid = (my_mask & my_ok & (s > 0.9) &
                     (jnp.abs(r) < cfg.max_resid))
            nR = my_normals @ R
            H = jnp.zeros((n_loc, ERR_DIM), my_pts.dtype)
            H = H.at[:, 0:3].set(my_normals)
            H = H.at[:, 3:6].set(-jnp.cross(nR, pb))
            finite = jnp.isfinite(r) & jnp.all(jnp.isfinite(H), axis=-1)
            valid = valid & finite
            H = jnp.where(valid[:, None], H, 0.0)
            r = jnp.where(valid, r, 0.0)
            inv_var = 1.0 / (cfg.meas_noise ** 2 + my_rms ** 2)
            w = valid.astype(my_pts.dtype)
            Hw = H * (w * inv_var)[:, None]
            HtH = jax.lax.psum(H.T @ Hw, axis)
            Htr = jax.lax.psum(Hw.T @ r, axis)
            E, _, _ = _gate_degenerate(cfg, HtH)
            HtH = E @ HtH @ E.T
            Htr = E @ Htr
            delta = boxminus(nav_i, nav_prop)
            dx = -jnp.linalg.solve(HtH + P_inv, Htr + P_inv @ delta) * upd_mask
            return boxplus(nav_i, dx), HtH

        carry0 = (nav_prop, jnp.zeros((ERR_DIM, ERR_DIM), ds_pts.dtype))
        nav_new, HtH_last = jax.lax.fori_loop(0, cfg.max_iters, iterate,
                                              carry0)
        P_new = jnp.linalg.inv(HtH_last + P_inv)
        P_new = 0.5 * (P_new + P_new.T)
        nav_new = jax.tree.map(
            lambda a, b: jnp.where(st.initialized, a, b), nav_new, nav_prop)
        P_new = jnp.where(st.initialized, P_new, P_prop)

        # ---- map insert: each device claims only the voxels it owns ----
        if cfg.map_voxel == cfg.scan_voxel:
            ins_pts, ins_mask = ds_pts, ds_mask
        else:
            ins_pts, ins_mask = voxel_downsample(pts_und, mask,
                                                 cfg.map_voxel,
                                                 cfg.ds_capacity)
            ins_pts = ins_pts[:, :3]
        ins_w = ((ins_pts @ nav_new.ext_rot.T + nav_new.ext_t)
                 @ nav_new.rot.T + nav_new.pos)
        ins_coords = jnp.floor(ins_w / local_map.voxel_size).astype(jnp.int32)
        mine = _owner_of(ins_coords, ndev) == me
        new_map = surfel_insert(local_map, ins_w, ins_mask & mine)

        moved = (jnp.linalg.norm(nav_new.pos - st.map_center)
                 > cfg.recenter_thresh)
        new_map = jax.lax.cond(
            moved, lambda mm: surfel_trim(mm, nav_new.pos, cfg.map_radius),
            lambda mm: mm, new_map)
        new_center = jnp.where(moved, nav_new.pos, st.map_center)

        new_st = LioState(nav=nav_new, P=P_new, map=new_map,
                          map_center=new_center,
                          initialized=jnp.full((), True),
                          step_count=st.step_count + 1)
        return new_st, nav_new.pose_matrix()

    return jax.jit(mxu_f32(step))

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsd_tpu.parallel import make_mesh, sharded_lio_update
from lsd_tpu.sim import CircleSim, SimConfig
from lsd_tpu.slam import LioConfig, lio_init, lio_step
from lsd_tpu.slam.imu import ImuNoise, propagate, undistort
from lsd_tpu.slam.state import ERR_DIM, init_state
from lsd_tpu.ops import voxel_downsample
from lsd_tpu.geometry import so3


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_update_matches_single_device():
    sim = CircleSim(SimConfig(n_scans=2, points_per_scan=8192, seed=3))
    data = sim.generate(capacity=8192, imu_capacity=16)
    R, p = sim.pose(0.0)
    nav0 = init_state()._replace(pos=jnp.asarray(p, jnp.float32),
                                 quat=so3.matrix_to_quat(jnp.asarray(R, jnp.float32)),
                                 vel=jnp.asarray(sim.velocity(0.0), jnp.float32))
    cfg = LioConfig(ds_capacity=4096, map_capacity=2 ** 15, scan_voxel=0.4, map_voxel=0.4)
    st = lio_init(cfg, nav0)
    # seed the map with scan 0
    P_, S_, M_, I_, IM_, T = data[0]
    st, _ = lio_step(cfg, st, jnp.asarray(P_), jnp.asarray(S_), jnp.asarray(M_),
                     jnp.asarray(I_), jnp.asarray(IM_))

    # scan 1: propagate + undistort + downsample once, then compare the
    # single-device iterate vs the sharded one
    P_, S_, M_, I_, IM_, T = data[1]
    nav_prop, P_prop, track = propagate(st.nav, st.P, jnp.asarray(I_), jnp.asarray(IM_),
                                        cfg.imu_noise, cfg.acc_scale)
    und = undistort(jnp.asarray(P_)[:, :3], jnp.asarray(S_), jnp.asarray(M_), nav_prop, track)
    ds_pts, ds_mask = voxel_downsample(und, jnp.asarray(M_), cfg.scan_voxel, cfg.ds_capacity)

    mesh = make_mesh()
    nav_sharded = sharded_lio_update(cfg, mesh, nav_prop, P_prop, st.map,
                                     ds_pts[:, :3], ds_mask)

    # single-device result via lio_step internals: rerun the full step and
    # compare the final pose (same inputs, same math modulo reduction order)
    st2, info = lio_step(cfg, st, jnp.asarray(P_), jnp.asarray(S_), jnp.asarray(M_),
                         jnp.asarray(I_), jnp.asarray(IM_))
    assert np.linalg.norm(np.asarray(nav_sharded.pos) - np.asarray(st2.nav.pos)) < 5e-3
    dq = np.abs(np.asarray(nav_sharded.quat) @ np.asarray(st2.nav.quat))
    assert dq > 1 - 1e-5

"""Pallas fused point-to-plane reduction vs the XLA reference path.

Runs in interpreter mode on CPU; on TPU the same kernel compiles via
Mosaic (ops/pallas_p2p.py).
"""
import jax
import jax.numpy as jnp
import numpy as np

from lsd_tpu.geometry import so3
from lsd_tpu.ops.pallas_p2p import p2p_reduce


def _setup(n=1500, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(scale=10, size=(n, 3)).astype(np.float32))
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    nrm = jnp.asarray(nrm.astype(np.float32))
    d = jnp.asarray(rng.normal(scale=0.1, size=n).astype(np.float32))
    w = jnp.asarray((rng.random(n) > 0.2).astype(np.float32) * 400.0)
    R = so3.exp_so3(jnp.asarray([0.02, -0.03, 0.4]))
    Re = so3.exp_so3(jnp.asarray([0.0, 0.01, -0.02]))
    te = jnp.asarray([0.1, 0.0, -0.05])
    pos = jnp.asarray([1.0, -2.0, 0.3])
    return pts, nrm, d, w, R, Re, te, pos


def _reference(pts, nrm, d, w, R, Re, te, pos, max_resid, est_ext):
    n = pts.shape[0]
    pb = pts @ Re.T + te
    pw = pb @ R.T + pos
    r = jnp.einsum("ni,ni->n", pw, nrm) + d
    pnorm = jnp.linalg.norm(pts, axis=-1)
    s = 1.0 - 0.9 * jnp.abs(r) / jnp.sqrt(jnp.maximum(pnorm, 1e-3))
    valid = (w > 0) & (s > 0.9) & (jnp.abs(r) < max_resid)
    nR = nrm @ R
    H = jnp.zeros((n, 24))
    H = H.at[:, 0:3].set(nrm)
    H = H.at[:, 3:6].set(-jnp.cross(nR, pb))
    if est_ext:
        H = H.at[:, 18:21].set(-jnp.cross(nR @ Re, pts))
        H = H.at[:, 21:24].set(nR)
    wv = valid * w
    Hw = H * wv[:, None]
    return H.T @ Hw, Hw.T @ r, valid, r, wv


class TestP2pReduce:
    def test_matches_reference(self):
        args = _setup()
        HtH, Htr, stats = p2p_reduce(*args, 1.0, est_extrinsic=True,
                                     interpret=True)
        HtH_ref, Htr_ref, valid, r, wv = _reference(*args, 1.0, True)
        scale = float(jnp.max(jnp.abs(HtH_ref)))
        assert float(jnp.max(jnp.abs(HtH - HtH_ref))) < 2e-6 * scale
        rscale = max(float(jnp.max(jnp.abs(Htr_ref))), 1.0)
        assert float(jnp.max(jnp.abs(Htr - Htr_ref))) < 2e-5 * rscale
        assert int(stats[0]) == int(valid.sum())
        np.testing.assert_allclose(float(stats[1]),
                                   float(jnp.sum(valid * jnp.abs(r))),
                                   rtol=1e-5)

    def test_no_extrinsic_zeroes_block(self):
        args = _setup()
        HtH, Htr, _ = p2p_reduce(*args, 1.0, est_extrinsic=False,
                                 interpret=True)
        assert float(jnp.max(jnp.abs(HtH[18:, :]))) == 0.0
        assert float(jnp.max(jnp.abs(Htr[18:]))) == 0.0
        HtH_ref, Htr_ref, *_ = _reference(*args, 1.0, False)
        assert float(jnp.max(jnp.abs(HtH - HtH_ref))) < 2e-6 * float(
            jnp.max(jnp.abs(HtH_ref)))

    def test_all_masked(self):
        pts, nrm, d, w, R, Re, te, pos = _setup(n=300)
        w = jnp.zeros_like(w)
        HtH, Htr, stats = p2p_reduce(pts, nrm, d, w, R, Re, te, pos, 1.0,
                                     interpret=True)
        assert float(jnp.max(jnp.abs(HtH))) == 0.0
        assert int(stats[0]) == 0

    def test_lio_step_pallas_matches_xla(self):
        from lsd_tpu.sim import CircleSim, SimConfig
        from lsd_tpu.slam import LioConfig, lio_init, lio_step
        from lsd_tpu.slam.state import init_state
        sim = CircleSim(SimConfig(n_scans=6, points_per_scan=2048,
                                  point_noise=0.01, seed=5))
        data = sim.generate(capacity=2048, imu_capacity=8)
        R0, p0 = sim.pose(0.0)
        nav0 = init_state()._replace(
            pos=jnp.asarray(p0, jnp.float32),
            quat=so3.matrix_to_quat(jnp.asarray(R0, jnp.float32)),
            vel=jnp.asarray(sim.velocity(0.0), jnp.float32))
        outs = {}
        for flag in (False, True):
            cfg = LioConfig(ds_capacity=1024, map_capacity=2 ** 13,
                            use_pallas_p2p=flag)
            st = lio_init(cfg, nav0)
            for tup in data:
                st, info = lio_step(cfg, st, *[jnp.asarray(a) for a in tup[:5]])
            outs[flag] = np.asarray(st.nav.pos)
        np.testing.assert_allclose(outs[True], outs[False], atol=1e-3)

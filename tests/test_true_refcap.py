"""True-reference-capacity detector (VERDICT r3 #2): 0.1 m pillars over
the reference's deployed range (detection_object.yaml [-64,-64,-2,
64,64,4], 0.1 m pitch) scattered space-to-depth into a dense 640^2 BEV.

Pins: the s2d scatter is a lossless permutation of the fine grid
(every fine cell maps to a unique (coarse cell, channel group)), config
shape math, and an end-to-end forward/decode at tiny point counts.
"""
import numpy as np
import jax
import jax.numpy as jnp

from lsd_tpu.models import DetectorConfig
from lsd_tpu.models.detector import CenterPointDetector, make_target_maps
from lsd_tpu.models.vfe import scatter_to_bev, scatter_to_bev_s2d


def test_config_shapes():
    cfg = DetectorConfig.true_reference_capacity()
    assert cfg.grid_hw == (1280, 1280)
    assert cfg.voxel_size[0] == 0.1
    assert cfg.s2d_factor == 2 and cfg.bev_stride == 2
    assert cfg.head_stride == 4
    assert cfg.head_hw == (320, 320)
    # head cell matches the 0.2 m config's head cell (0.4 m): AP deltas
    # between the two configs isolate the input-pitch effect
    ref = DetectorConfig.reference_capacity()
    assert cfg.voxel_size[0] * cfg.head_stride == \
        ref.voxel_size[0] * ref.head_stride


def test_s2d_scatter_is_permutation_of_fine_grid():
    """Unfolding the s2d output's channel groups must exactly rebuild the
    fine-grid scatter."""
    rng = np.random.default_rng(0)
    H = W = 16
    f = 2
    V = 40
    coords = np.zeros((V, 3), np.int64)
    coords[:, 1] = rng.integers(0, H, V)
    coords[:, 2] = rng.integers(0, W, V)
    feats = rng.normal(size=(V, 3)).astype(np.float32)
    vmask = rng.random(V) < 0.8
    fine = np.asarray(scatter_to_bev(jnp.asarray(feats), jnp.asarray(coords),
                                     jnp.asarray(vmask), (H, W)))
    s2d = np.asarray(scatter_to_bev_s2d(jnp.asarray(feats),
                                        jnp.asarray(coords),
                                        jnp.asarray(vmask), (H, W), f))
    assert s2d.shape == (H // f, W // f, f * f * 3)
    rebuilt = np.zeros_like(fine)
    for gy in range(f):
        for gx in range(f):
            grp = gy * f + gx
            rebuilt[gy::f, gx::f] = s2d[:, :, grp * 3:(grp + 1) * 3]
    np.testing.assert_allclose(rebuilt, fine, atol=1e-6)


def test_forward_decode_and_targets():
    cfg = DetectorConfig.true_reference_capacity()
    model = CenterPointDetector(cfg)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(scale=25, size=(2048, 4)).astype(np.float32))
    msk = jnp.ones((2048,), bool)
    params = model.init(jax.random.PRNGKey(0), pts, msk)
    preds = model.apply(params, pts, msk)
    assert preds["heatmap"].shape == (320, 320, 3)
    boxes = model.decode(preds)[0]
    assert boxes.shape[-1] == 7
    assert bool(jnp.isfinite(boxes).all())
    # target maps land on the head grid with the fine-pitch geometry
    gt = jnp.asarray([[10.0, -5.0, 0.0, 4.0, 2.0, 1.6, 0.3]], jnp.float32)
    t = make_target_maps(cfg, gt, jnp.asarray([0]), jnp.asarray([True]))
    assert t["heatmap"].shape == (320, 320, 3)
    iy, ix = np.unravel_index(int(jnp.argmax(t["heatmap"][:, :, 0])),
                              (320, 320))
    # center cell: (10 - (-64)) / 0.4 = 185, (-5 - (-64)) / 0.4 = 147.5
    assert abs(ix - 185) <= 1 and abs(iy - 147) <= 1

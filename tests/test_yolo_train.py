"""Camera 2D detector training path (training/yolo.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from lsd_tpu.models.yolo2d import Yolo2DConfig, decode_yolo2d
from lsd_tpu.training.yolo import (SyntheticTrafficLightDataset,
                                   TrafficLightSceneConfig, YoloTrainer,
                                   make_yolo_targets)


def test_scene_generator_shapes():
    ds = SyntheticTrafficLightDataset(TrafficLightSceneConfig(),
                                      batch_size=2, seed=3)
    b = ds.batch()
    assert b["image"].shape == (2, 256, 320, 3)
    assert b["image"].min() >= 0 and b["image"].max() <= 1
    assert b["gt_mask"].any()
    gb = b["gt_boxes"][b["gt_mask"]]
    assert np.all(gb[:, 2] > gb[:, 0]) and np.all(gb[:, 3] > gb[:, 1])
    assert set(np.unique(b["gt_labels"][b["gt_mask"]])) <= {0, 1, 2, 3}


def test_targets_decode_roundtrip():
    """Targets fed straight into the decoder reproduce the gt box."""
    cfg = Yolo2DConfig(num_classes=4, stride=16, max_boxes=8)
    gt = jnp.asarray([[64.0, 32.0, 96.0, 112.0]])
    lab = jnp.asarray([2], jnp.int32)
    t = make_yolo_targets(cfg, (256, 320), gt, lab, jnp.ones(1, bool))
    assert t["obj"].shape == (16, 20)
    preds = dict(obj=(t["obj"] * 20 - 10)[..., None],
                 cls=t["cls"] * 20 - 10, box=t["box"])
    boxes, scores, labels, mask = decode_yolo2d(preds, 16, 8)
    np.testing.assert_allclose(np.asarray(boxes[0]), np.asarray(gt[0]),
                               atol=0.5)
    assert int(labels[0]) == 2


@pytest.mark.slow
def test_tiny_train_reduces_loss_and_detects():
    scfg = TrafficLightSceneConfig(hw=(128, 160), max_lights=1,
                                   n_distractors=2)
    tr = YoloTrainer(Yolo2DConfig(num_classes=4, channels=(8, 16, 32, 32)),
                     hw=scfg.hw, lr=2e-3, total_steps=120)
    ds = SyntheticTrafficLightDataset(scfg, batch_size=4, seed=1)
    losses = []
    for k, b in enumerate(ds.batches(120)):
        jb = {kk: jnp.asarray(v) for kk, v in b.items()}
        tr.params, tr.opt_state, loss, _ = tr._step(tr.params, tr.opt_state, jb)
        if k % 20 == 0:
            losses.append(float(loss))
    assert losses[-1] < losses[0]

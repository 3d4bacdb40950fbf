"""Detection training pipeline (lsd_tpu/training): loss goes down on
synthetic scenes, eval AP runs through decode+NMS, dp-sharded step
matches single-device, checkpoints roundtrip, labeled-recording dataset
reads gt from pkl frames."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lsd_tpu.models import DetectorConfig
from lsd_tpu.training import (LabeledFrameDataset, SyntheticDetectionDataset,
                              Trainer, TrainerConfig)

SMALL = DetectorConfig(pc_range=(-48.0, -48.0, -3.0, 48.0, 48.0, 3.0),
                       voxel_size=(1.2, 1.2, 6.0), max_voxels=2048,
                       max_points_per_voxel=8, max_boxes=64)


def small_trainer(mesh=None, steps=50):
    return Trainer(det_cfg=SMALL,
                   cfg=TrainerConfig(lr=5e-3, warmup_steps=5,
                                     total_steps=steps, log_every=1000),
                   mesh=mesh)


def small_dataset(seed=5, batch_size=1):
    from lsd_tpu.training.data import SyntheticSceneConfig
    return SyntheticDetectionDataset(
        SyntheticSceneConfig(clutter_points=2048),
        point_capacity=2 ** 12, batch_size=batch_size, seed=seed)


class TestSyntheticData:
    def test_scene_shapes_and_geometry(self):
        ds = SyntheticDetectionDataset(point_capacity=2 ** 14, batch_size=2)
        b = next(ds.batches(1))
        assert b["points"].shape == (2, 2 ** 14, 4)
        assert b["gt_boxes"].shape[2] == 7
        gm = b["gt_mask"][0]
        boxes = b["gt_boxes"][0][gm]
        assert len(boxes) == 8
        # object points must lie near their boxes: check points above
        # ground are within the scene radius
        pts = b["points"][0][b["mask"][0]]
        above = pts[pts[:, 2] > 0.5]
        assert len(above) > 500
        assert np.abs(above[:, :2]).max() < 45.0


@pytest.mark.slow
class TestTrainer:
    def test_loss_decreases(self):
        tr = small_trainer()
        ds = small_dataset()
        losses = []
        for batch in ds.batches(50):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            tr.params, tr.opt_state, loss, _ = tr._train_step(
                tr.params, tr.opt_state, jb)
            tr.step += 1
            losses.append(float(jax.device_get(loss)))
        first = np.mean(losses[:8])
        last = np.mean(losses[-8:])
        assert np.isfinite(losses).all()
        assert last < first * 0.8, (first, last)

    def test_eval_and_checkpoint(self, tmp_path):
        tr = small_trainer(steps=20)
        ds = small_dataset()
        tr.fit(ds.batches(20))
        eval_b = list(small_dataset(seed=9).batches(2))
        m = tr.evaluate(eval_b)
        assert 0.0 <= m["mean_ap"] <= 1.0
        path = tr.save(str(tmp_path / "w.msgpack"))
        tr2 = small_trainer()
        tr2.load(path)
        chex = jax.tree.map(lambda a, b: np.allclose(a, b), tr.params,
                            tr2.params)
        assert all(jax.tree.leaves(chex))

    def test_dp_sharded_matches_single(self):
        devs = jax.devices()
        if len(devs) < 2:
            pytest.skip("needs multi-device (virtual CPU mesh)")
        mesh = jax.sharding.Mesh(np.asarray(devs[:2]), ("dp",))
        tr_s = small_trainer()
        tr_m = small_trainer(mesh=mesh)
        # deep-copy: the train step donates params/opt_state buffers
        tr_m.params = jax.tree.map(jnp.array, tr_s.params)
        tr_m.opt_state = jax.tree.map(jnp.array, tr_s.opt_state)
        ds = small_dataset(seed=11, batch_size=2)
        batch = {k: jnp.asarray(v) for k, v in next(ds.batches(1)).items()}
        p_s, o_s, l_s, _ = tr_s._train_step(tr_s.params, tr_s.opt_state,
                                            batch)
        p_m, o_m, l_m, _ = tr_m._train_step(tr_m.params, tr_m.opt_state,
                                            batch)
        assert float(l_s) == pytest.approx(float(l_m), rel=1e-4)
        leaves_s, leaves_m = jax.tree.leaves(p_s), jax.tree.leaves(p_m)
        for a, b in zip(leaves_s, leaves_m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestLabeledDataset:
    def test_reads_gt_from_pkl(self, tmp_path):
        from lsd_tpu.io.recorder import FrameRecorder
        from tests.test_io import make_frame_dict
        rec = FrameRecorder(str(tmp_path / "rec"))
        for k in range(4):
            d = make_frame_dict(ts=1000000 + k * 100000)
            d["gt_boxes"] = np.asarray([[1.0, 2, 0.5, 4, 2, 1.5, 0.2]],
                                       np.float32)
            d["gt_labels"] = np.asarray([0], np.int32)
            rec.write(d)
        ds = LabeledFrameDataset(rec.log_dir, point_capacity=4096,
                                 box_capacity=8, batch_size=2, shuffle=False)
        assert len(ds) == 4
        b = next(ds.batches(1))
        assert b["points"].shape == (2, 4096, 4)
        assert b["gt_mask"][0].sum() == 1
        np.testing.assert_allclose(b["gt_boxes"][0][0],
                                   [1.0, 2, 0.5, 4, 2, 1.5, 0.2])


class TestSegTraining:
    """Freespace BEV head training (ref segment_head_bev drivable_area)."""

    def test_seg_target_geometry(self):
        import jax.numpy as jnp
        from lsd_tpu.models import DetectorConfig
        from lsd_tpu.models.detector import make_seg_target

        cfg = DetectorConfig()
        H, W = cfg.head_hw
        vx = cfg.voxel_size[0] * cfg.bev_stride
        # one flat ground patch at (10, 10), one tall pole at (-10, -10),
        # rest unobserved
        g = np.stack([np.full(50, 10.0) + np.linspace(0, 0.2, 50),
                      np.full(50, 10.0), np.random.default_rng(0).normal(
                          0, 0.01, 50), np.zeros(50)], 1)
        p = np.stack([np.full(30, -10.0), np.full(30, -10.0),
                      np.linspace(0, 3, 30), np.zeros(30)], 1)
        pts = np.concatenate([g, p]).astype(np.float32)
        seg, segm = make_seg_target(cfg, jnp.asarray(pts),
                                    jnp.ones(len(pts), bool))
        seg, segm = np.asarray(seg), np.asarray(segm)
        gx = int((10.0 - cfg.pc_range[0]) / vx)
        gy = int((10.0 - cfg.pc_range[1]) / vx)
        px = int((-10.0 - cfg.pc_range[0]) / vx)
        py = int((-10.0 - cfg.pc_range[1]) / vx)
        assert seg[gy, gx] == 1.0 and segm[gy, gx] == 1.0   # flat ground
        assert seg[py, px] == 0.0 and segm[py, px] == 1.0   # pole cell
        assert segm[0, 0] == 0.0                            # unobserved
        # loss only counts observed cells
        assert segm.sum() < 10

    def test_seg_loss_trains_the_head(self):
        from lsd_tpu.training.data import SyntheticSceneConfig
        tr = small_trainer(steps=25)
        ds = SyntheticDetectionDataset(
            SyntheticSceneConfig(clutter_points=2048, realistic=True),
            point_capacity=2 ** 12, batch_size=1, seed=5)
        losses = []
        for b in ds.batches(25):
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            tr.params, tr.opt_state, loss, aux = tr._train_step(
                tr.params, tr.opt_state, jb)
            losses.append(float(jax.device_get(aux["seg_loss"])))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])  # head is learning
        m = tr.evaluate(list(SyntheticDetectionDataset(
            SyntheticSceneConfig(clutter_points=2048, realistic=True),
            point_capacity=2 ** 12, batch_size=1, seed=9).batches(1)))
        assert "seg_iou" in m and 0.0 <= m["seg_iou"] <= 1.0

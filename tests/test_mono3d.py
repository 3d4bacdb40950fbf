"""Mono3D (RTM3D-style) model + camera-lidar late fusion tests."""
import jax
import jax.numpy as jnp
import numpy as np

from lsd_tpu.detection.camera_fusion import (fuse_camera_lidar, iou_2d,
                                             project_box_to_image)
from lsd_tpu.models.mono3d import (Mono3D, Mono3DConfig, decode_mono3d,
                                   make_mono3d_targets, mono3d_loss)

K = np.asarray([[500.0, 0, 320.0], [0, 500.0, 192.0], [0, 0, 1.0]])


class TestDecode:
    def test_target_decode_roundtrip(self):
        """Perfect target maps must decode back to the GT boxes."""
        cfg = Mono3DConfig()
        gt = np.asarray([[2.0, 0.5, 20.0, 4.0, 1.8, 1.5, 0.3],
                         [-3.0, 0.8, 35.0, 0.6, 0.6, 1.7, -0.5]])
        labels = np.asarray([0, 1])
        t = make_mono3d_targets(cfg, gt, labels, K)
        # build "ideal" prediction maps from targets (invert activations)
        eps = 1e-6
        heat_logit = np.log(np.clip(t["heat"], eps, 1 - eps) /
                            np.clip(1 - t["heat"], eps, 1 - eps))
        off_logit = np.log(np.clip(t["offset"], eps, 1 - eps) /
                           np.clip(1 - t["offset"], eps, 1 - eps))
        z = np.maximum(t["depth"], eps)
        depth_logit = np.log((1.0 / (z + 1.0)) / (1 - 1.0 / (z + 1.0) + eps))
        preds = dict(heat=jnp.asarray(heat_logit),
                     offset=jnp.asarray(off_logit),
                     depth=jnp.asarray(depth_logit),
                     dims=jnp.asarray(t["dims"]),
                     rot=jnp.asarray(t["rot"]))
        boxes, scores, labs, valid = decode_mono3d(preds, jnp.asarray(K),
                                                   max_objects=8)
        boxes = np.asarray(boxes)[np.asarray(valid)]
        labs = np.asarray(labs)[np.asarray(valid)]
        assert len(boxes) >= 2
        for g, lab in zip(gt, labels):
            d = np.linalg.norm(boxes[:, :3] - g[:3], axis=1)
            i = int(np.argmin(d))
            assert d[i] < 0.5, (g, boxes[i])
            np.testing.assert_allclose(boxes[i, 3:6], g[3:6], rtol=0.05)
            assert abs((boxes[i, 6] - g[6] + np.pi) % (2 * np.pi) - np.pi) < 0.05
            assert labs[i] == lab

    def test_model_forward_and_loss(self):
        cfg = Mono3DConfig(image_hw=(96, 160), base_ch=8)
        model = Mono3D(cfg)
        img = jnp.zeros((96, 160, 3))
        params = model.init(jax.random.PRNGKey(0), img)
        preds = model.apply(params, img)
        assert preds["heat"].shape == (24, 40, cfg.num_classes)
        gt = np.asarray([[0.5, 0.2, 12.0, 4.0, 1.8, 1.5, 0.0]])
        t = make_mono3d_targets(cfg, gt, np.asarray([0]),
                                np.asarray([[100.0, 0, 80], [0, 100.0, 48],
                                            [0, 0, 1]]))
        targets = {k: jnp.asarray(v) for k, v in t.items()}
        loss, parts = mono3d_loss(preds, targets)
        assert np.isfinite(float(loss))
        # one gradient step reduces the loss
        import optax
        tx = optax.adam(1e-3)
        opt = tx.init(params)
        def lf(p):
            return mono3d_loss(model.apply(p, img), targets)[0]
        l0, g = jax.value_and_grad(lf)(params)
        for _ in range(5):
            u, opt = tx.update(jax.grad(lf)(params), opt)
            params = optax.apply_updates(params, u)
        assert float(lf(params)) < float(l0)


class TestFusion:
    def _lidar_obj(self, x=20.0, y=0.0, score=0.6):
        # lidar frame: x forward, y left, z up
        return dict(box=np.asarray([x, y, -0.5, 4.0, 1.8, 1.5, 0.0]),
                    score=score, label=0, id=1)

    def _v2c(self):
        # lidar (x fwd, y left, z up) -> camera (x right, y down, z fwd)
        V2C = np.zeros((4, 4))
        V2C[0, 1] = -1.0   # cam x = -lidar y
        V2C[1, 2] = -1.0   # cam y = -lidar z
        V2C[2, 0] = 1.0    # cam z =  lidar x
        V2C[3, 3] = 1.0
        return V2C

    def test_projection(self):
        rect = project_box_to_image(self._lidar_obj()["box"], self._v2c(), K,
                                    (384, 640))
        assert rect is not None
        assert rect[0] < 320 < rect[2]        # centered box spans cx
        behind = dict(self._lidar_obj())
        behind["box"][0] = -20.0
        assert project_box_to_image(behind["box"], self._v2c(), K,
                                    (384, 640)) is None

    def test_matched_confidence_rule(self):
        lo = self._lidar_obj(score=0.6)
        rect = project_box_to_image(lo["box"], self._v2c(), K, (384, 640))
        cam = dict(rect=rect, score=0.8, label=0, box=None)
        out = fuse_camera_lidar([lo], [cam], self._v2c(), K)
        assert len(out) == 1 and out[0]["fused"] == "matched"
        np.testing.assert_allclose(out[0]["score"], 0.7 + 0.2 * 1.0, atol=1e-6)

    def test_unmatched_lists(self):
        lo = self._lidar_obj()
        far_cam = dict(rect=np.asarray([0.0, 0, 10, 10]), score=0.5,
                       label=0, box=None)
        heat = np.full((96, 160, 4), 0.9, np.float32)
        out = fuse_camera_lidar([lo], [far_cam], self._v2c(), K, heat=heat)
        kinds = sorted(o["fused"] for o in out)
        assert kinds == ["unmatch_camera", "unmatch_lidar"]
        ul = [o for o in out if o["fused"] == "unmatch_lidar"][0]
        np.testing.assert_allclose(ul["score"], (0.6 + 0.9) / 2, atol=1e-6)

    def test_iou(self):
        a = np.asarray([0, 0, 10, 10.0])
        assert iou_2d(a, a) == 1.0
        assert iou_2d(a, np.asarray([10, 10, 20, 20.0])) == 0.0


class TestMono3DTraining:
    def test_synthetic_scene_and_train_step(self):
        """training/mono3d.py: renderer produces learnable scenes (boxes
        above ground, finite targets); one jitted train step runs and a
        short fit reduces the loss."""
        from lsd_tpu.models.mono3d import Mono3DConfig
        from lsd_tpu.training.mono3d import (Mono3DSceneConfig,
                                             Mono3DTrainer,
                                             SyntheticMono3DDataset)

        hw = (96, 160)
        ds = SyntheticMono3DDataset(Mono3DSceneConfig(hw=hw, max_objects=3),
                                    batch_size=2, seed=0)
        b = ds.batch()
        assert b["image"].shape == (2, *hw, 3)
        assert float(b["image"].min()) >= 0 and float(b["image"].max()) <= 1
        assert b["t_heat"].max() == 1.0 and b["t_mask"].sum() > 0

        tr = Mono3DTrainer(Mono3DConfig(image_hw=hw, base_ch=8),
                           lr=3e-3, total_steps=12)
        losses = []
        for k, batch in enumerate(ds.batches(12)):
            jb = {kk: jnp.asarray(v) for kk, v in batch.items()}
            tr.params, tr.opt_state, loss, _ = tr._step(
                tr.params, tr.opt_state, jb)
            losses.append(float(jax.device_get(loss)))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

        m = tr.evaluate(list(SyntheticMono3DDataset(
            Mono3DSceneConfig(hw=hw, max_objects=3), batch_size=2,
            seed=9).batches(1)))
        assert set(m) >= {"mean_ap", "per_class"}

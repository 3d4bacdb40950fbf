import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsd_tpu.ops.iou3d import boxes_iou3d, boxes_giou3d, boxes_overlap_bev, nms_bev
from lsd_tpu.detection import (ObjectFilter, PostProcessConfig, Tracker3D,
                               TrackerConfig, postprocess)
from lsd_tpu.detection.object_filter import points_in_polygon
from lsd_tpu.models import (CenterPointDetector, DetectorConfig,
                            detection_loss, make_target_maps)


def box(x=0, y=0, z=0, dx=4, dy=2, dz=1.6, yaw=0.0):
    return [x, y, z, dx, dy, dz, yaw]


class TestIou3d:
    def test_identical_boxes(self):
        b = jnp.asarray([box()], jnp.float32)
        np.testing.assert_allclose(np.asarray(boxes_iou3d(b, b)), [[1.0]], atol=1e-4)

    def test_disjoint(self):
        a = jnp.asarray([box(0, 0)], jnp.float32)
        b = jnp.asarray([box(100, 0)], jnp.float32)
        np.testing.assert_allclose(np.asarray(boxes_iou3d(a, b)), [[0.0]], atol=1e-6)

    def test_axis_aligned_half_overlap(self):
        a = jnp.asarray([box(0, 0, dx=4, dy=2)], jnp.float32)
        b = jnp.asarray([box(2, 0, dx=4, dy=2)], jnp.float32)
        # overlap bev: 2x2=4; union 8+8-4=12 -> z full overlap -> IoU=1/3
        np.testing.assert_allclose(np.asarray(boxes_iou3d(a, b)), [[1 / 3]], atol=1e-3)

    def test_rotated_overlap(self):
        # unit squares, one rotated 45 deg: known overlap = 2*(sqrt(2)-1)
        a = jnp.asarray([box(0, 0, dx=1, dy=1, dz=1)], jnp.float32)
        b = jnp.asarray([box(0, 0, dx=1, dy=1, dz=1, yaw=np.pi / 4)], jnp.float32)
        ov = float(boxes_overlap_bev(a, b)[0, 0])
        np.testing.assert_allclose(ov, 2 * (np.sqrt(2) - 1), atol=1e-3)

    def test_giou_bounds_and_order(self):
        a = jnp.asarray([box(0, 0)], jnp.float32)
        near = jnp.asarray([box(1, 0)], jnp.float32)
        far = jnp.asarray([box(8, 0)], jnp.float32)
        g_near = float(boxes_giou3d(a, near)[0, 0])
        g_far = float(boxes_giou3d(a, far)[0, 0])
        assert -1.0 <= g_far < g_near <= 1.0

    def test_nms(self):
        boxes = jnp.asarray([box(0, 0), box(0.5, 0), box(20, 0)], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        mask = jnp.ones(3, bool)
        idx, keep = nms_bev(boxes, scores, mask, iou_thresh=0.1, max_keep=3)
        kept = set(np.asarray(idx)[np.asarray(keep)].tolist())
        assert kept == {0, 2}


class TestPostprocess:
    def test_thresholds_and_budget(self):
        cfg = PostProcessConfig(score_thresh=(0.5, 0.5, 0.5), max_objects=8)
        boxes = jnp.asarray([box(i * 10, 0) for i in range(16)], jnp.float32)
        scores = jnp.asarray([0.9] * 4 + [0.1] * 12)
        labels = jnp.zeros(16, jnp.int32)
        b, s, l, keep = postprocess(cfg, boxes, scores, labels, jnp.ones(16, bool))
        assert int(keep.sum()) == 4


class TestTracker:
    def test_track_constant_velocity(self):
        trk = Tracker3D(TrackerConfig())
        ids = []
        for k in range(8):
            out = trk.update(np.asarray([box(k * 1.0, 0)]), np.asarray([0.9]),
                             np.asarray([0]), dt=0.1)
            if out["objects"]:
                ids.append(out["objects"][0]["id"])
        assert len(set(ids)) == 1  # stable identity
        o = out["objects"][0]
        # velocity estimate ~ 10 m/s in x
        assert abs(o["velocity"][0] - 10.0) < 3.0
        assert o["trajectory"].shape == (20, 7)
        # trajectory extrapolates forward in x
        assert o["trajectory"][-1][0] > o["box"][0] + 5.0

    def test_track_death_and_id_recycle(self):
        trk = Tracker3D(TrackerConfig(max_misses=1))
        trk.update(np.asarray([box(0, 0)]), np.asarray([0.9]), np.asarray([0]))
        tid = trk.tracks[0].id
        for _ in range(3):
            trk.update(np.zeros((0, 7)), np.zeros(0), np.zeros(0))
        assert len(trk.tracks) == 0

    def test_two_stage_association(self):
        trk = Tracker3D(TrackerConfig(score_high=0.5))
        trk.update(np.asarray([box(0, 0)]), np.asarray([0.9]), np.asarray([0]))
        # low-score detection continues the track (stage 2), no new track
        out = trk.update(np.asarray([box(0.3, 0)]), np.asarray([0.2]), np.asarray([0]))
        assert out["num_tracks"] == 1
        assert trk.tracks[0].misses == 0

    def test_ego_motion_compensation(self):
        trk = Tracker3D(TrackerConfig())
        trk.update(np.asarray([box(10, 0)]), np.asarray([0.9]), np.asarray([0]))
        # ego moved forward 1m: static object shifts -1 in ego frame
        motion = np.eye(4)
        motion[0, 3] = -1.0
        out = trk.update(np.asarray([box(9, 0)]), np.asarray([0.9]),
                         np.asarray([0]), motion=motion)
        assert out["num_tracks"] == 1
        # velocity should remain ~0 (object is static in world)
        assert abs(out["objects"][0]["velocity"][0]) < 1.0


class TestObjectFilter:
    def test_point_in_polygon(self):
        sq = np.asarray([[0, 0], [2, 0], [2, 2], [0, 2]])
        got = points_in_polygon(np.asarray([[1.0, 1.0], [3.0, 1.0]]), sq)
        assert got.tolist() == [True, False]

    def test_filters(self):
        f = ObjectFilter(class_enabled=[True, False],
                         exclude_polygons=[np.asarray([[5, -1], [7, -1], [7, 1], [5, 1]])])
        objs = [dict(box=np.asarray(box(0, 0)), label=0),
                dict(box=np.asarray(box(0, 3)), label=1),      # disabled class
                dict(box=np.asarray(box(6, 0)), label=0)]      # excluded region
        out = f.filter(dict(objects=objs))
        assert len(out["objects"]) == 1


class TestDetectorModel:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = DetectorConfig(pc_range=(-16.0, -16.0, -3.0, 16.0, 16.0, 3.0),
                             voxel_size=(0.5, 0.5, 6.0), max_voxels=2048,
                             max_points_per_voxel=8, max_boxes=64)
        model = CenterPointDetector(cfg)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-15, 15, (4096, 4)).astype(np.float32)
        pts[:, 2] = rng.uniform(-1, 1, 4096)
        pts[:, 3] = rng.uniform(0, 1, 4096)
        mask = np.ones(4096, bool)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask))
        return cfg, model, params, pts, mask

    def test_forward_shapes(self, setup):
        cfg, model, params, pts, mask = setup
        preds = model.apply(params, jnp.asarray(pts), jnp.asarray(mask))
        H, W = cfg.grid_hw
        assert preds["heatmap"].shape == (H, W, cfg.num_classes)
        assert preds["dim"].shape == (H, W, 3)
        boxes, scores, labels, bmask = model.decode(preds)
        assert boxes.shape == (cfg.max_boxes, 7)
        assert np.all(np.isfinite(np.asarray(boxes)))

    def test_loss_and_grad(self, setup):
        cfg, model, params, pts, mask = setup
        gt = jnp.asarray([box(2.0, 3.0, 0.0), box(-5.0, -5.0, 0.5)], jnp.float32)
        gt_labels = jnp.asarray([0, 1])
        gt_mask = jnp.ones(2, bool)
        targets = make_target_maps(cfg, gt, gt_labels, gt_mask)
        H, W = cfg.grid_hw
        assert targets["heatmap"].shape == (H, W, cfg.num_classes)
        assert float(targets["heatmap"].max()) > 0.9

        def loss_fn(p):
            preds = model.apply(p, jnp.asarray(pts), jnp.asarray(mask))
            loss, aux = detection_loss(preds, targets)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
        assert gnorm > 0

    def test_training_reduces_loss(self, setup):
        import optax
        cfg, model, params, pts, mask = setup
        gt = jnp.asarray([box(2.0, 3.0, 0.0)], jnp.float32)
        targets = make_target_maps(cfg, gt, jnp.asarray([0]), jnp.ones(1, bool))
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(p, s):
            def loss_fn(p):
                preds = model.apply(p, jnp.asarray(pts), jnp.asarray(mask))
                return detection_loss(preds, targets)[0]
            loss, g = jax.value_and_grad(loss_fn)(p)
            up, s = tx.update(g, s)
            return optax.apply_updates(p, up), s, loss

        losses = []
        for _ in range(8):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


def test_bev_stride2_target_decode_roundtrip():
    """bev_stride=2 (reference-capacity layout): targets drawn at head
    resolution must decode back to the gt box."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lsd_tpu.models import (CenterPointDetector, DetectorConfig,
                                make_target_maps)
    from lsd_tpu.models.center_head import decode_boxes

    cfg = DetectorConfig(pc_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 3.0),
                         voxel_size=(0.25, 0.25, 6.0), max_voxels=512,
                         max_points_per_voxel=4, max_boxes=8, bev_stride=2)
    assert cfg.grid_hw == (64, 64) and cfg.head_hw == (32, 32)
    gt = jnp.asarray([[1.5, -2.25, 0.4, 4.0, 2.0, 1.6, 0.3]], jnp.float32)
    t = make_target_maps(cfg, gt, jnp.zeros(1, jnp.int32),
                         jnp.ones(1, bool))
    assert t["heatmap"].shape == (32, 32, cfg.num_classes)
    # feed the targets straight into the decoder (logit-ify the heatmap)
    preds = dict(heatmap=jnp.log(jnp.clip(t["heatmap"], 1e-6, 1 - 1e-6) /
                                 (1 - jnp.clip(t["heatmap"], 1e-6, 1 - 1e-6))),
                 offset=t["offset"], z=t["z"], dim=t["dim"], rot=t["rot"])
    boxes, scores, cls, mask = decode_boxes(
        preds, cfg.voxel_size, cfg.pc_range, stride=cfg.bev_stride,
        max_boxes=4)
    b = np.asarray(boxes[0])
    np.testing.assert_allclose(b, np.asarray(gt[0]), atol=1e-2)

    # the model builds + runs end-to-end at this stride
    model = CenterPointDetector(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-7, 7, (512, 4)).astype(np.float32))
    msk = jnp.ones(512, bool)
    params = model.init(jax.random.PRNGKey(0), pts, msk)
    preds = model.apply(params, pts, msk)
    assert preds["heatmap"].shape == (32, 32, cfg.num_classes)


def test_reference_capacity_config_shapes():
    from lsd_tpu.models import DetectorConfig
    cfg = DetectorConfig.reference_capacity()
    assert cfg.grid_hw == (640, 640)
    assert cfg.head_hw == (320, 320)
    assert cfg.pc_range[3] == 64.0 and cfg.voxel_size[0] == 0.2


def test_rotation_loss_is_pi_symmetric():
    """L(rot_pred, theta) == L(rot_pred, theta + pi): a cuboid's geometry
    (and rotated IoU) can't tell the two apart, so neither may the loss —
    plain L1 collapses heading to zero on symmetric training objects."""
    import jax.numpy as jnp
    import numpy as np
    from lsd_tpu.models import DetectorConfig, make_target_maps
    from lsd_tpu.models.detector import detection_loss

    cfg = DetectorConfig(pc_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 3.0),
                         voxel_size=(0.5, 0.5, 6.0), max_voxels=256,
                         max_points_per_voxel=4, max_boxes=4)
    H, W = cfg.grid_hw
    rng = np.random.default_rng(0)
    preds = dict(heatmap=jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32),
                 offset=jnp.zeros((H, W, 2)), z=jnp.zeros((H, W, 1)),
                 dim=jnp.zeros((H, W, 3)),
                 rot=jnp.asarray(rng.normal(size=(H, W, 2)), jnp.float32))
    th = 0.8
    losses = []
    for theta in (th, th + np.pi):
        gt = jnp.asarray([[1.0, -2.0, 0.4, 4.0, 2.0, 1.6, theta]], jnp.float32)
        t = make_target_maps(cfg, gt, jnp.zeros(1, jnp.int32),
                             jnp.ones(1, bool))
        losses.append(float(detection_loss(preds, t)[0]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_scatter_to_voxel_bev_layout():
    """scatter_to_voxel_bev places each z-bin in its own channel group
    (z-major within a group of C channels), NOT the reference's C-major
    view(N, C*D, H, W) ordering — assert the documented (H, W, Z*C) layout."""
    from lsd_tpu.models.vfe import scatter_to_voxel_bev

    H, W, Z, C = 4, 5, 3, 2
    feats = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], jnp.float32)
    #                 z  y  x
    coords = jnp.asarray([[0, 1, 2],
                          [2, 1, 2],
                          [1, 3, 4]], jnp.int32)
    vmask = jnp.asarray([True, True, False])
    vol = scatter_to_voxel_bev(feats, coords, vmask, (H, W), Z)
    assert vol.shape == (H, W, Z * C)
    out = np.asarray(vol)
    # voxel 0: z=0 -> channels [0*C : 1*C) at (y=1, x=2)
    np.testing.assert_allclose(out[1, 2, 0:2], [1.0, 2.0])
    # voxel 1: z=2 -> channels [2*C : 3*C) at same cell
    np.testing.assert_allclose(out[1, 2, 4:6], [3.0, 4.0])
    # middle z-bin empty there
    np.testing.assert_allclose(out[1, 2, 2:4], [0.0, 0.0])
    # masked voxel dropped
    np.testing.assert_allclose(out[3, 4], np.zeros(Z * C))
    # duplicate scatter accumulates
    vol2 = scatter_to_voxel_bev(jnp.concatenate([feats, feats]),
                                jnp.concatenate([coords, coords]),
                                jnp.concatenate([vmask, vmask]), (H, W), Z)
    np.testing.assert_allclose(np.asarray(vol2), 2 * out)


def test_voxel_height_encoder_nondivisible_filters():
    """GroupNorm group count must divide num_filters (ADVICE r2): 48 is not
    divisible by 32, gcd(32, 48)=16 is."""
    from lsd_tpu.models.vfe import VoxelHeightEncoder

    enc = VoxelHeightEncoder(num_filters=48, dtype=jnp.float32)
    vol = jnp.ones((8, 8, 6), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), vol)
    out = enc.apply(params, vol)
    assert out.shape == (8, 8, 48)
    assert np.all(np.isfinite(np.asarray(out)))


def test_voxel_encoder_detector_forward_and_grad():
    """encoder='voxel' wires MeanVFE -> scatter_to_voxel_bev ->
    VoxelHeightEncoder into the detector (ADVICE r2 #1): forward shapes,
    finite loss, nonzero gradients."""
    from lsd_tpu.models import (CenterPointDetector, DetectorConfig,
                                detection_loss, make_target_maps)

    cfg = DetectorConfig(pc_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 3.0),
                         voxel_size=(0.5, 0.5, 1.5), max_voxels=256,
                         max_points_per_voxel=4, max_boxes=16,
                         encoder="voxel")
    assert cfg.grid_z == 4
    model = CenterPointDetector(cfg)
    rng = np.random.default_rng(3)
    pts = jnp.asarray(rng.uniform(-7, 7, (512, 4)).astype(np.float32))
    msk = jnp.ones((512,), bool)
    params = model.init(jax.random.PRNGKey(0), pts, msk)
    preds = model.apply(params, pts, msk)
    H, W = cfg.head_hw
    assert preds["heatmap"].shape == (H, W, cfg.num_classes)

    gt = jnp.asarray([[1.0, 1.0, 0.0, 4.0, 2.0, 1.6, 0.3]], jnp.float32)
    tgt = make_target_maps(cfg, gt, jnp.zeros(1, jnp.int32), jnp.ones(1, bool))

    def loss_fn(p):
        return detection_loss(model.apply(p, pts, msk), tgt)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0

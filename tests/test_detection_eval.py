"""Detection AP + MOT metrics (detection/eval.py; the measurements the
reference gets from OpenPCDet/AB3DMOT toolchains, README.md:36-47)."""
import numpy as np
import pytest

from lsd_tpu.detection.eval import ap_3d, evaluate_frames, evaluate_mot


def box(x, y, heading=0.0, size=(4.0, 2.0, 1.6), z=0.0):
    return [x, y, z, size[0], size[1], size[2], heading]


class TestAp3d:
    def test_perfect_predictions(self):
        gt = [np.asarray([box(0, 0), box(10, 0)])]
        out = ap_3d(gt, [np.asarray([0.9, 0.8])], gt, iou_thresh=0.7)
        assert out["ap"] == pytest.approx(1.0)
        assert out["recall"] == pytest.approx(1.0)

    def test_no_predictions(self):
        gt = [np.asarray([box(0, 0)])]
        out = ap_3d([np.zeros((0, 7))], [np.zeros(0)], gt)
        assert out["ap"] == 0.0 and out["n_gt"] == 1

    def test_false_positives_lower_ap(self):
        gt = [np.asarray([box(0, 0)])]
        # one hit at lower score + one confident miss far away
        preds = [np.asarray([box(50, 50), box(0.1, 0)])]
        scores = [np.asarray([0.95, 0.9])]
        out = ap_3d(preds, scores, gt, iou_thresh=0.5)
        assert 0.3 < out["ap"] < 0.9

    def test_localization_threshold(self):
        gt = [np.asarray([box(0, 0)])]
        preds = [np.asarray([box(1.5, 0)])]     # ~significant offset
        hi = ap_3d(preds, [np.ones(1)], gt, iou_thresh=0.25)
        lo = ap_3d(preds, [np.ones(1)], gt, iou_thresh=0.7)
        assert hi["ap"] > lo["ap"]

    def test_per_class(self):
        frames = [dict(boxes=np.asarray([box(0, 0), box(10, 0)]),
                       scores=np.asarray([0.9, 0.9]),
                       labels=np.asarray([0, 1]),
                       gt_boxes=np.asarray([box(0, 0), box(10, 0)]),
                       gt_labels=np.asarray([0, 1]))]
        out = evaluate_frames(frames, iou_thresh={0: 0.7, 1: 0.5})
        assert out[0]["ap"] == pytest.approx(1.0)
        assert out[1]["ap"] == pytest.approx(1.0)


class TestMot:
    def make_track_frames(self, n=10, id_switch_at=None):
        frames = []
        tid = 7
        for k in range(n):
            if id_switch_at is not None and k == id_switch_at:
                tid = 8
            frames.append(dict(
                gt_ids=np.asarray([1]),
                gt_boxes=np.asarray([box(k * 1.0, 0)]),
                track_ids=np.asarray([tid]),
                boxes=np.asarray([box(k * 1.0 + 0.1, 0)]),
                scores=np.asarray([0.9])))
        return frames

    def test_perfect_tracking(self):
        out = evaluate_mot(self.make_track_frames())
        assert out["mota"] == pytest.approx(1.0)
        assert out["ids"] == 0
        assert out["motp"] > 0.7
        assert out["amota"] > 0.9

    def test_id_switch_counted(self):
        out = evaluate_mot(self.make_track_frames(id_switch_at=5))
        assert out["ids"] == 1
        assert out["mota"] == pytest.approx(0.9)

    def test_misses_and_fp(self):
        frames = self.make_track_frames()
        frames[3]["track_ids"] = np.asarray([], np.int64)   # miss
        frames[3]["boxes"] = np.zeros((0, 7))
        frames[3]["scores"] = np.zeros(0)
        frames[4]["track_ids"] = np.asarray([7, 99])
        frames[4]["boxes"] = np.asarray([box(4.1, 0), box(50, 50)])  # fp
        frames[4]["scores"] = np.asarray([0.9, 0.9])
        out = evaluate_mot(frames)
        assert out["misses"] == 1 and out["false_pos"] == 1
        assert out["mota"] == pytest.approx(0.8)

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lsd_tpu.slam.keyframe import Keyframe
from lsd_tpu.slam.map_render import colorize_cloud, colorize_map, export_colmap

K = np.asarray([[100.0, 0, 64], [0, 100, 48], [0, 0, 1]])


def make_image():
    # left half red, right half green (BGR)
    img = np.zeros((96, 128, 3), np.uint8)
    img[:, :64] = (0, 0, 255)
    img[:, 64:] = (0, 255, 0)
    return img


class TestColorize:
    def test_colors_sampled_correctly(self):
        img = make_image()
        # camera at origin looking +z; points left (x<0) project left
        pts = np.asarray([[-1.0, 0.0, 5.0], [1.0, 0.0, 5.0], [0.0, 0.0, -1.0]])
        rgb, valid = colorize_cloud(pts, img, K, np.eye(4))
        assert valid.tolist() == [True, True, False]
        np.testing.assert_allclose(rgb[0], [1.0, 0.0, 0.0], atol=0.02)  # red
        np.testing.assert_allclose(rgb[1], [0.0, 1.0, 0.0], atol=0.02)  # green

    def test_colorize_map_and_export(self, tmp_path):
        img = make_image()
        ok, jpg = cv2.imencode(".jpg", img)
        # lidar frame == camera frame (T identity); one keyframe at origin
        cloud = np.asarray([[-1.0, 0.0, 5.0, 0.5], [1.0, 0.0, 5.0, 0.5]],
                           np.float32)
        kf = Keyframe(id=0, stamp_us=1, pose=np.eye(4), odom=np.eye(4),
                      cloud=cloud, images={"front": jpg.tobytes()})
        cmap = colorize_map([kf], K, np.eye(4))
        assert cmap.shape == (2, 6)
        np.testing.assert_allclose(cmap[0, 3:], [1, 0, 0], atol=0.05)

        out = export_colmap(str(tmp_path / "colmap"), [kf], K, np.eye(4),
                            (128, 96), map_points=cmap)
        assert os.path.exists(os.path.join(out, "cameras.txt"))
        cams = open(os.path.join(out, "cameras.txt")).read()
        assert "PINHOLE 128 96" in cams
        imgs = open(os.path.join(out, "images.txt")).read()
        assert "000000.jpg" in imgs
        # identity pose -> identity quaternion, zero translation
        row = [l for l in imgs.splitlines() if l.endswith(".jpg")][0].split()
        np.testing.assert_allclose([float(x) for x in row[1:8]],
                                   [1, 0, 0, 0, 0, 0, 0], atol=1e-6)
        pts = open(os.path.join(out, "points3D.txt")).read().splitlines()
        assert len([l for l in pts if not l.startswith("#")]) == 2
        assert os.path.exists(os.path.join(out, "images", "000000.jpg"))


def test_editor_rgb_color_map():
    """get_color_map packs true RGB when camera params + keyframe images
    exist and export color is enabled."""
    import cv2
    import numpy as np
    from lsd_tpu.slam.map_editor import MapEditor

    class FakeKf:
        def __init__(self):
            # points 5 m ahead of a camera looking down +x (lidar frame)
            self.cloud = np.asarray([[5.0, 0.0, 0.0, 0.5],
                                     [5.0, 0.5, 0.0, 0.5]], np.float32)
            self.pose = np.eye(4)
            self.stamp_us = 0
            img = np.zeros((240, 320, 3), np.uint8)
            img[:, :, 2] = 255      # pure red (BGR)
            ok, buf = cv2.imencode(".jpg", img)
            self.images = {"front": buf.tobytes()}

    class FakeGraph:
        se3 = []
        fixed = [True]

    class FakeMapper:
        def __init__(self):
            self.store = type("S", (), {"frames": [FakeKf()]})()
            self.graph = FakeGraph()
            self.loops = []
            self.origin_lla = None
            self.updater = type("U", (), {"accum_distance": 0.0})()
            class Cfg: use_floor_prior = False
            self.cfg = Cfg()

    # camera at origin looking along lidar +x: standard cam axes
    # (z forward) via axis permutation
    T = np.zeros((4, 4)); T[3, 3] = 1
    T[0, 1] = -1.0   # cam x = -lidar y
    T[1, 2] = -1.0   # cam y = -lidar z
    T[2, 0] = 1.0    # cam z =  lidar x
    K = np.asarray([[200.0, 0, 160], [0, 200.0, 120], [0, 0, 1]])
    ed = MapEditor(FakeMapper(),
                   camera_params={"front": dict(K=K, T_cam_from_lidar=T)})
    ed.set_export_map_config(-100, 100, True)
    blob = ed.get_color_map()
    from lsd_tpu.proto.internal import parse_pointcloud_map
    msg = parse_pointcloud_map(blob)
    assert msg["lp"][0]["type"] == "rgb"
    attr = np.frombuffer(msg["lp"][0]["attr"], np.float32)
    packed = attr.view(np.uint32)
    r = (packed >> 16) & 0xFF
    assert (r > 200).all(), r   # red image -> red points

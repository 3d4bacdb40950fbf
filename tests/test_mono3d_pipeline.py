"""Mono3D in the LIVE pipeline (VERDICT r3 #6): camera mono3D beside the
lidar engine, late-fused and tracked (ref docs/detect.md:70-80 — RTM3D on
DLA + rule-based post fusion).

Covers the geometry (camera-frame box -> lidar frame, image rect), the
Mono3DInfer runtime wrapper, and the DetectModule plumbing: camera-only
objects must appear in the fused, tracked output.
"""
import numpy as np
import pytest

from lsd_tpu.detection.mono3d_infer import (Mono3DInfer, cam_box_to_lidar,
                                            cam_rect, shipped_mono3d_weights)


def _cam_extrinsic():
    """Camera looking along lidar +x: cam z = lidar x, cam x = lidar -y,
    cam y = lidar -z.  Returns T_cam_from_lidar (V2C)."""
    V2C = np.eye(4)
    V2C[:3, :3] = np.asarray([[0, -1, 0],
                              [0, 0, -1],
                              [1, 0, 0]], float)
    return V2C


class TestGeometry:
    def test_cam_box_to_lidar_roundtrip(self):
        V2C = _cam_extrinsic()
        C2V = np.linalg.inv(V2C)
        # object 10 m ahead of the camera (cam z), slightly right+down
        box_cam = np.asarray([1.0, 0.5, 10.0, 4.0, 1.8, 1.5, 0.0])
        bl = cam_box_to_lidar(box_cam, C2V)
        # cam (x=1, y=0.5, z=10) -> lidar (x=10, y=-1, z=-0.5)
        np.testing.assert_allclose(bl[:3], [10.0, -1.0, -0.5], atol=1e-6)
        np.testing.assert_allclose(bl[3:6], [4.0, 1.8, 1.5], atol=1e-6)
        # cam yaw 0 => length axis along cam +x = lidar -y => yaw -pi/2
        assert abs(abs(bl[6]) - np.pi / 2) < 1e-6

    def test_cam_yaw_quarter_turn(self):
        V2C = _cam_extrinsic()
        C2V = np.linalg.inv(V2C)
        # cam yaw pi/2: length axis dir (cos, 0, -sin) = (0, 0, -1) cam
        # = -lidar x => lidar yaw pi
        bl = cam_box_to_lidar(
            np.asarray([0.0, 0.0, 10.0, 4.0, 1.8, 1.5, np.pi / 2]), C2V)
        assert abs(abs(bl[6]) - np.pi) < 1e-6

    def test_cam_rect_center_object(self):
        K = np.asarray([[500.0, 0, 320.0], [0, 500.0, 192.0], [0, 0, 1]])
        rect = cam_rect(np.asarray([0.0, 0.0, 20.0, 4.0, 2.0, 1.6, 0.0]),
                        K, (384, 640))
        assert rect is not None
        # centered object: rect symmetric around the principal point
        assert abs((rect[0] + rect[2]) / 2 - 320.0) < 2.0
        assert abs((rect[1] + rect[3]) / 2 - 192.0) < 2.0

    def test_cam_rect_behind_camera(self):
        K = np.asarray([[500.0, 0, 320.0], [0, 500.0, 192.0], [0, 0, 1]])
        assert cam_rect(np.asarray([0, 0, -5.0, 4, 2, 1.6, 0]),
                        K, (384, 640)) is None


@pytest.fixture(scope="module")
def tiny_weights(tmp_path_factory):
    """Random-init tiny-model checkpoint: the pipeline tests exercise
    PLUMBING (decode, fusion, tracking); quality is scored by the trained
    checkpoint in tools/train_mono3d + eval."""
    import jax
    import jax.numpy as jnp
    from lsd_tpu.models.mono3d import Mono3D, Mono3DConfig
    from lsd_tpu.models.params_io import save_params
    mcfg = Mono3DConfig(image_hw=(96, 160), base_ch=8)
    model = Mono3D(mcfg)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((96, 160, 3), jnp.float32))
    p = str(tmp_path_factory.mktemp("m3") / "mono3d_tiny.msgpack")
    save_params(p, params)
    return p, mcfg


class TestMono3DInfer:
    def test_refuses_random_init(self, monkeypatch):
        if shipped_mono3d_weights() is None:
            with pytest.raises(ValueError):
                Mono3DInfer(weights=None)

    def test_detect_returns_objects(self, tiny_weights):
        path, mcfg = tiny_weights
        inf = Mono3DInfer(weights=path, score_thresh=0.0, mcfg=mcfg)
        K = np.asarray([[140.0, 0, 80.0], [0, 140.0, 48.0], [0, 0, 1]])
        img = np.random.default_rng(0).random((96, 160, 3)).astype(np.float32)
        det = inf.detect(img, K, C2V=np.linalg.inv(_cam_extrinsic()))
        assert det["K_scaled"] is not None
        assert det["heat"].shape[-1] == mcfg.num_classes
        for o in det["camera_objs"]:
            assert o["rect"].shape == (4,)
            assert o["box_lidar"].shape == (7,)

    def test_intrinsic_rescaled_with_image(self, tiny_weights):
        path, mcfg = tiny_weights
        inf = Mono3DInfer(weights=path, score_thresh=0.0, mcfg=mcfg)
        K = np.asarray([[280.0, 0, 160.0], [0, 280.0, 96.0], [0, 0, 1]])
        img = (np.random.default_rng(0).random((192, 320, 3)) * 255
               ).astype(np.uint8)
        _, Ks = inf._prep(img, K)
        np.testing.assert_allclose(Ks[0, 0], 140.0)
        np.testing.assert_allclose(Ks[1, 2], 48.0)


class TestPipelineFusion:
    def _detect_module(self, tiny_weights, with_lidar=False):
        from lsd_tpu.runtime import clear_interfaces
        from lsd_tpu.runtime.config import AttrDict, DEFAULT_CONFIG
        from lsd_tpu.runtime.modules import DetectModule
        import copy
        clear_interfaces()
        path, mcfg = tiny_weights
        cfg = AttrDict(copy.deepcopy(DEFAULT_CONFIG))
        cfg["detection"]["enable"] = False
        cfg["detection"]["mono3d"] = dict(enable=True, weights=path,
                                          camera="cam0",
                                          score_threshold=0.0)
        cfg["camera"] = [dict(name="cam0",
                              intrinsic_parameters=[140.0, 140.0, 80.0,
                                                    48.0, 0, 0, 0, 0, 0],
                              extrinsic_parameters=[0, 0, 0, 0, 0, 0])]
        mod = DetectModule(cfg)
        mod.setup(cfg)
        mod.mono3d.cfg = mcfg          # tiny model under test
        return mod

    def test_camera_only_objects_tracked(self, tiny_weights):
        """VERDICT r3 #6 done-criterion: camera-only objects appear in
        the fused, tracked output of the Detect stage."""
        import cv2
        path, mcfg = tiny_weights
        mod = self._detect_module(tiny_weights)
        # the infer wrapper was built before we swapped cfg; rebuild with
        # the tiny hw so _prep doesn't upscale to 384x640
        from lsd_tpu.detection.mono3d_infer import Mono3DInfer
        from lsd_tpu.detection import Tracker3D, TrackerConfig
        mod.mono3d = Mono3DInfer(weights=path, score_thresh=0.0, mcfg=mcfg)
        # random-init scores are low; drop the tracker's birth threshold
        # so the plumbing (camera objs -> fusion -> tracks) is observable
        mod.tracker = Tracker3D(TrackerConfig(score_high=0.01, min_hits=1))
        img = (np.random.default_rng(1).random((96, 160, 3)) * 255
               ).astype(np.uint8)
        ok, jpeg = cv2.imencode(".jpg", img)
        assert ok
        d = dict(frame_start_timestamp=1_000_000,
                 frame_timestamp_monotonic=1_000_000,
                 points={}, points_attr={},
                 image={"cam0": jpeg.tobytes()},
                 lidar_valid=False, image_valid=True,
                 timestep=100000)
        out = None
        for k in range(3):     # tracker needs hits to confirm a track
            d2 = dict(d)
            d2["frame_start_timestamp"] = 1_000_000 + k * 100000
            d2["frame_timestamp_monotonic"] = d2["frame_start_timestamp"]
            out = mod.process(d2)
        assert out is not None and "objects" in out
        assert len(out["objects"]) > 0
        for o in out["objects"]:
            assert np.isfinite(np.asarray(o["box"], float)).all()

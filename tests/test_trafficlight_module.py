import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lsd_tpu.runtime import ConfigManager, clear_interfaces
from lsd_tpu.runtime.trafficlight_module import (TrafficlightModule,
                                                 build_yolo_predict_fn)


@pytest.fixture(autouse=True)
def _clean():
    clear_interfaces()
    yield
    clear_interfaces()


class TestTrafficlightModule:
    def test_pipeline_stage_attaches_lights(self):
        cfg = ConfigManager().config
        cfg.trafficlight = dict(
            enable=True,
            camera="front",
            intrinsic=[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]],
            image_size=[640, 480],
            lights=[dict(name="tl_a", position=[30.0, 0.0, 5.0])])
        mod = TrafficlightModule(cfg)
        mod.setup(cfg)
        assert mod.predict_fn is not None

        img = np.random.default_rng(0).integers(0, 255, (480, 640, 3),
                                                dtype=np.uint8)
        ok, jpg = cv2.imencode(".jpg", img)
        d = dict(image={"front": jpg.tobytes()}, image_param={},
                 slam_pose=np.eye(4).tolist())
        out = mod.process(d)
        assert "lights" in out
        # untrained model: association may be empty, but all entries must be
        # proto-ready dicts for the selected map light
        for l in out["lights"]:
            assert l["name"] == "tl_a"
            assert set(l) >= {"id", "color", "pictogram", "confidence", "name"}

    def test_disabled_or_no_image_degrades(self):
        cfg = ConfigManager().config
        mod = TrafficlightModule(cfg)
        mod.setup(cfg)
        out = mod.process(dict(image={}))
        assert out["lights"] == []

    def test_predict_fn_scales_boxes(self):
        fn = build_yolo_predict_fn()
        img = np.random.default_rng(1).integers(0, 255, (480, 640, 3),
                                                dtype=np.uint8)
        boxes, scores, labels, keep = fn(img)
        assert boxes.shape[1] == 4
        assert np.all(np.isfinite(boxes))


def test_parse_xodr_signals(tmp_path):
    from lsd_tpu.detection.trafficlight import (parse_map_anchor,
                                                parse_xodr_signals)
    xodr = tmp_path / "map.xodr"
    xodr.write_text("""<?xml version="1.0"?>
<OpenDRIVE>
 <road id="1">
  <signals>
   <signal id="s1" name="Signal_3Light">
    <positionInertial x="10.5" y="-3.0" z="5.2"/>
    <userData code="name" value="north_light"/>
    <userData code="width" value="0.3"/>
   </signal>
   <signal id="s2" name="SpeedLimit"> <!-- not a light -->
    <positionInertial x="0" y="0" z="0"/>
   </signal>
  </signals>
 </road>
</OpenDRIVE>""")
    lights = parse_xodr_signals(str(xodr))
    assert len(lights) == 1
    assert lights[0].name == "north_light"
    assert lights[0].position.tolist() == [10.5, -3.0, 5.2]
    assert lights[0].attrs["width"] == "0.3"

    anchor = tmp_path / "anchor.txt"
    anchor.write_text("37.1 -122.2 15.0 90.0 0.0 0.0\n")
    a = parse_map_anchor(str(anchor))
    assert a["lat"] == 37.1 and a["yaw"] == 90.0
    assert parse_map_anchor(str(tmp_path / "missing")) is None
    assert parse_xodr_signals(str(tmp_path / "missing.xodr")) == []

import json
import time
import urllib.request

import pytest

from lsd_tpu.io.recorder import FrameRecorder
from lsd_tpu.runtime import clear_interfaces
from lsd_tpu.runtime.perception import Perception
from lsd_tpu.web import PerceptionServer
from tests.test_io import make_frame_dict


@pytest.fixture
def server(tmp_path):
    clear_interfaces()
    rec = FrameRecorder(str(tmp_path / "rec"))
    for k in range(5):
        rec.write(make_frame_dict(ts=1000000 + k * 100000))
    p = Perception()
    cfg = p.get_config()
    cfg["input"]["data_path"] = rec.log_dir
    cfg["pipeline"] = [["Source", "Sink"]]
    p.config_manager.set_config(cfg)
    p.setup()
    p.start()
    srv = PerceptionServer(p)
    port = srv.start(host="127.0.0.1", port=0)
    yield f"http://127.0.0.1:{port}", p
    srv.stop()
    p.release()
    clear_interfaces()


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, r.read()


def _post(url, body=None):
    data = json.dumps(body or {}).encode()
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status, r.read()


class TestWebApi:
    def test_config_get_set(self, server):
        base, p = server
        st, body = _get(base + "/v1/config")
        cfg = json.loads(body)
        assert cfg["slam"]["mode"] == "mapping"
        cfg["output"]["protocol"]["UDP"]["use"] = True
        st, body = _post(base + "/v1/config", cfg)
        assert json.loads(body)["result"] == "Success"

    def test_status(self, server):
        base, p = server
        st, body = _post(base + "/v1/status")
        out = json.loads(body)
        assert out["status"] == "Running"
        assert "Source" in out["modules"]

    def test_player_controls(self, server):
        base, p = server
        st, body = _post(base + "/v1/player-pause")
        assert json.loads(body)["status"] == "ok"
        st, body = _post(base + "/v1/player-seek", {"percent": 50})
        assert json.loads(body)["status"] == "ok"
        st, body = _post(base + "/v1/player-play")
        assert json.loads(body)["status"] == "ok"

    def test_detection_pb_endpoint(self, server):
        base, p = server
        # first poll arms the HttpSink; then frames flow and bytes appear
        deadline = time.time() + 5
        data = b""
        while time.time() < deadline and not data:
            st, data = _post(base + "/v1/detection-pb")
            time.sleep(0.1)
        assert data, "no protobuf payload produced"
        from lsd_tpu.proto import parse_detection
        out = parse_detection(data)
        assert "header" in out

    def test_jsonrpc(self, server):
        base, p = server
        st, body = _post(base + "/api", {"method": "dump", "id": 1})
        out = json.loads(body)
        assert "stacks" in out["result"]

    def test_unknown_route_404(self, server):
        base, p = server
        try:
            _get(base + "/v1/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404


class TestBuiltinUi:
    def test_index_served(self, server):
        url, _ = server
        status, body = _get(url + "/")
        assert status == 200
        assert b"<!DOCTYPE html>" in body and b"LSD-TPU" in body
        status, body = _get(url + "/index.html")
        assert status == 200

    def test_static_path_traversal_blocked(self, server):
        url, _ = server
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(url + "/../server.py")
        assert e.value.code == 404

    def test_detection_json(self, server):
        url, _ = server
        import base64
        import numpy as np
        d = None
        for _ in range(30):
            status, body = _post(url + "/v1/detection-json", {})
            d = json.loads(body)
            if d.get("valid"):
                break
            time.sleep(0.1)
        assert d and d["valid"]
        raw = base64.b64decode(d["points_b64"])
        assert len(raw) % 16 == 0
        pts = np.frombuffer(raw, np.float32).reshape(-1, 4)
        assert len(pts) == d["num_points"] and len(pts) > 0
        assert np.isfinite(pts).all()
        assert isinstance(d["objects"], list)

    def test_detection_json_subsample(self, server):
        url, _ = server
        for _ in range(30):
            status, body = _post(url + "/v1/detection-json",
                                 {"max_points": 10})
            d = json.loads(body)
            if d.get("valid"):
                break
            time.sleep(0.1)
        assert d["valid"] and d["num_points"] <= 20

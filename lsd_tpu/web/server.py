"""HTTP API server: the reference's /v1 surface on the stdlib.

Re-derivation of web_backend/server.py + perception_server.py +
module/source/player_server.py + module/slam/slam_server.py route tables —
the same endpoints, served by a threading stdlib HTTP server (Flask is not
in the image; the API shape is what matters for UI parity):

    GET  /v1/config               POST /v1/config
    GET  /v1/restore-config       POST /v1/status
    POST /v1/detection-pb         (protobuf Detection bytes)
    GET  /v1/player-status        POST /v1/player-seek / -rate / -play /
                                       -pause / -step
    POST /v1/map-save             POST /v1/set-init-pose
    POST /api                     (JSON-RPC: method + params)
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, Optional, Tuple

from ..runtime.interface import call_interface, has_interface
from ..runtime.perception import Perception
from ..utils.log import get_logger


class PerceptionServer:
    def __init__(self, perception: Perception):
        self.perception = perception
        self.logger = get_logger("web")
        self.httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        p = perception
        self.routes: Dict[Tuple[str, str], Callable[[Dict], Any]] = {
            ("GET", "/v1/config"): lambda q: p.get_config(),
            ("POST", "/v1/config"): lambda body: {"result": p.set_config(body)},
            ("GET", "/v1/restore-config"): self._restore_config,
            ("POST", "/v1/status"): lambda body: p.get_status(),
            ("GET", "/v1/status"): lambda q: p.get_status(),
            ("POST", "/v1/detection-pb"): self._detection_pb,
            ("GET", "/v1/player-status"): lambda q: {"playing": True},
            ("POST", "/v1/player-seek"): lambda b: self._call_ok("player.seek", b.get("percent", 0)),
            ("POST", "/v1/player-rate"): lambda b: self._call_ok("player.set_rate", b.get("rate", 1.0)),
            ("POST", "/v1/player-play"): lambda b: self._call_ok("player.resume"),
            ("POST", "/v1/player-pause"): lambda b: self._call_ok("player.pause"),
            ("POST", "/v1/player-step"): lambda b: self._call_ok("player.step"),
            ("POST", "/v1/map-save"): lambda b: self._call_ok("slam.save_map", b.get("path", "/tmp/lsd_tpu_map")),
            ("POST", "/v1/set-init-pose"): lambda b: self._call_ok("slam.set_init_pose", b.get("pose")),
            # map editor (ref slam_server.py /v1/map-* routes)
            ("GET", "/v1/graph-meta"): lambda q: self._call_ok("slam.get_graph_meta"),
            ("POST", "/v1/vertex-data"): lambda b: self._call_ok("slam.get_key_frame", b.get("id", 0)),
            ("POST", "/v1/add-edge"): lambda b: self._call_ok("slam.add_edge", b.get("prev"), b.get("next"), b.get("relative")),
            ("POST", "/v1/del-edge"): lambda b: self._call_ok("slam.del_edge", b.get("id")),
            ("POST", "/v1/set-vertex-fix"): lambda b: self._call_ok("slam.set_vertex_fix", b.get("id"), b.get("fix", True)),
            ("POST", "/v1/graph-optimize"): lambda b: self._call_ok("slam.graph_optimize"),
            ("GET", "/v1/slam-pose"): lambda q: {"pose": call_interface("slam.get_pose")} if has_interface("slam.get_pose") else {"pose": None},
            ("GET", "/v1/message-meta"): self._message_meta,
            ("POST", "/v1/message-data"): self._message_data,
            ("POST", "/v1/ipc-enable"): self._ipc_enable,
            ("POST", "/v1/detection-json"): self._detection_json,
            ("GET", "/v1/detection-json"): self._detection_json,
            ("POST", "/api"): self._jsonrpc,
        }
        self._message_server = None

    # TViz backend ------------------------------------------------------
    def _ensure_message_server(self):
        if self._message_server is None:
            from ..comms import MessageBus, MessageServer
            self._message_server = MessageServer(MessageBus.core())
        return self._message_server

    def _message_meta(self, q: Dict) -> Dict:
        return self._ensure_message_server().get_meta()

    def _message_data(self, body: Dict) -> Dict:
        srv = self._ensure_message_server()
        ch = body.get("channel", "")
        if body.get("field"):
            return {"series": srv.get_series(ch, body["field"])}
        out = srv.get_latest(ch)
        return out if out is not None else {}

    def _ipc_enable(self, body: Dict) -> Dict:
        from ..comms import MessageBus
        MessageBus.core().set_enabled(bool(body.get("enable", True)))
        return {"status": "ok"}

    # handlers ----------------------------------------------------------
    def _restore_config(self, q: Dict) -> Dict:
        from ..runtime.config import DEFAULT_CONFIG
        self.perception.config_manager.set_config(DEFAULT_CONFIG)
        return self.perception.get_config()

    def _detection_pb(self, body: Dict) -> bytes:
        if has_interface("sink.get_proto_http"):
            data = call_interface("sink.get_proto_http")
            if data:
                return data
        return b""

    def _detection_json(self, body: Dict) -> Dict:
        """JSON preview frame for the built-in web UI (points as base64
        float32 xyzi; objects in proto field names; pose; jpeg images)."""
        import base64

        import numpy as np
        out: Dict[str, Any] = {"valid": False}
        frame = (call_interface("databank.get_latest")
                 if has_interface("databank.get_latest") else None)
        if frame is None:
            return out
        out["valid"] = True
        out["timestamp"] = int(frame.get("frame_start_timestamp", 0))
        max_pts = int(body.get("max_points", 60000)) if isinstance(body, dict) else 60000
        clouds = [np.asarray(p, np.float32).reshape(-1, 4)
                  for p in frame.get("points", {}).values()]
        if clouds:
            pts = np.concatenate(clouds, axis=0)
            if len(pts) > max_pts:
                pts = pts[:: len(pts) // max_pts + 1]
            out["points_b64"] = base64.b64encode(
                np.ascontiguousarray(pts, np.float32).tobytes()).decode()
            out["num_points"] = int(len(pts))
        objs = []
        for o in frame.get("objects", []):
            b = np.asarray(o.get("box", np.zeros(7)), float)
            objs.append(dict(id=int(o.get("id", 0)),
                             label=int(o.get("label", 0)),
                             score=float(o.get("score", 0.0)),
                             box=[float(v) for v in b[:7]],
                             velocity=[float(v) for v in
                                       np.asarray(o.get("velocity", [0, 0, 0]), float)[:3]],
                             trajectory=[[float(v) for v in row[:3]]
                                         for row in np.asarray(
                                             o.get("trajectory", np.zeros((0, 7))), float)]))
        out["objects"] = objs
        if has_interface("slam.get_pose"):
            out["pose"] = call_interface("slam.get_pose")
        ins = frame.get("ins_data") or {}
        if ins:
            out["ins"] = {k: ins.get(k, 0) for k in
                          ("latitude", "longitude", "altitude", "heading",
                           "Status")}
        images = {}
        for name, img in (frame.get("image") or {}).items():
            if isinstance(img, (bytes, bytearray)):
                images[name] = base64.b64encode(bytes(img)).decode()
        if images:
            out["images_b64"] = images
        return out

    def _call_ok(self, name: str, *args) -> Dict:
        if not has_interface(name):
            return {"status": "error", "message": f"no interface {name}"}
        out = call_interface(name, *args)
        return {"status": "ok", "result": out}

    def _jsonrpc(self, body: Dict) -> Dict:
        method = body.get("method", "")
        params = body.get("params", [])
        mapping = {
            "reboot": lambda: {"status": "unsupported-in-dev"},
            "start_record": lambda: self._call_ok("record.start"),
            "stop_record": lambda: self._call_ok("record.stop"),
            "start_player": lambda: self._call_ok("player.resume"),
            "pause_player": lambda: self._call_ok("player.pause"),
            "dump": lambda: {"stacks": self.perception.dump()},
        }
        if method in mapping:
            return {"id": body.get("id"), "result": mapping[method]()}
        if has_interface(method):
            return {"id": body.get("id"),
                    "result": call_interface(method, *params)}
        return {"id": body.get("id"), "error": f"unknown method {method}"}

    # server ------------------------------------------------------------
    def start(self, host: str = "0.0.0.0", port: int = 1234) -> int:
        routes = self.routes
        logger = self.logger

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def _dispatch(self, method: str) -> None:
                path = self.path.split("?")[0]
                fn = routes.get((method, path))
                if fn is None:
                    if method == "GET" and self._serve_static(path):
                        return
                    self.send_response(404)
                    self.end_headers()
                    return
                body: Dict = {}
                if method == "POST":
                    ln = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(ln) if ln else b""
                    if raw:
                        try:
                            body = json.loads(raw)
                        except ValueError:
                            # malformed JSON must NOT silently become {} —
                            # e.g. POST /v1/config with {} would reset the
                            # whole configuration
                            self.send_response(400)
                            self.send_header("Content-Type", "application/json")
                            self.end_headers()
                            self.wfile.write(b'{"error": "malformed JSON body"}')
                            return
                try:
                    out = fn(body)
                except Exception as e:  # surface errors as 500 JSON
                    logger.exception("route %s failed", path)
                    self.send_response(500)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(json.dumps({"error": str(e)}).encode())
                    return
                if isinstance(out, bytes):
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.end_headers()
                    self.wfile.write(out)
                else:
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(json.dumps(out).encode())

            def _serve_static(self, path: str) -> bool:
                """Serve the built-in UI from web/www (ref: Flask serving
                the prebuilt www/ bundle, web_backend/server.py:34-40)."""
                import mimetypes
                import os
                www = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "www")
                rel = path.lstrip("/") or "index.html"
                full = os.path.realpath(os.path.join(www, rel))
                if not full.startswith(os.path.realpath(www) + os.sep) and \
                        full != os.path.realpath(os.path.join(www, "index.html")):
                    return False
                if not os.path.isfile(full):
                    return False
                ctype = mimetypes.guess_type(full)[0] or "application/octet-stream"
                with open(full, "rb") as f:
                    data = f.read()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
                return True

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        actual_port = self.httpd.server_address[1]
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        name="WebServer", daemon=True)
        self._thread.start()
        self.logger.info("web API listening on %s:%d", host, actual_port)
        return actual_port

    def stop(self) -> None:
        if self.httpd:
            self.httpd.shutdown()
            self.httpd.server_close()
            self.httpd = None

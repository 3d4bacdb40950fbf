"""Dev + store pages and i18n coverage (VERDICT r4 #9).

Reference surfaces covered:
  web_ui/src/components/dev/{index.tsx,BoardConfig.jsx,
  SelectFunctions.jsx,Log.jsx} — the developer page (mode switch, raw
  JSON config editor with the needReboot flow, web-store backed feature
  switches, log-file browser);
  web_ui/src/components/store/{avfunSlice.js,index.js} — the avfuns
  store (defaults merged under the persisted web store, gating UI
  surfaces);
  web_ui/src/plugins/i18n{,-en,-zh}.js — full-dictionary i18n.

No browser runtime exists in this image, so DOM/JS contracts are
checked statically (same harness as test_editor_html.py) and the HTTP
surfaces are driven directly.
"""
import json
import os
import re
import urllib.parse
import urllib.request

import pytest

WWW = os.path.join(os.path.dirname(__file__), "..", "lsd_tpu", "web", "www")
PAGES = ["index.html", "editor.html", "calibration.html", "upgrade.html"]


def _page(name):
    with open(os.path.join(WWW, name)) as fh:
        return fh.read()


class TestDevPageDom:
    def test_mode_switch_sections(self):
        """ref dev/index.tsx: a mode selector switching Log / BoardConfig /
        SelectFunctions panes."""
        src = _page("index.html")
        assert 'id="dev-mode"' in src
        for sec in ("dev-log", "dev-board", "dev-funcs"):
            assert f'id="{sec}"' in src, sec

    def test_board_config_editor(self):
        """ref dev/BoardConfig.jsx: raw JSON editor, reset/update against
        /v1/config, and the Reboot-status confirm dialog."""
        src = _page("index.html")
        for eid in ("bc-reset", "bc-update", "bc-text"):
            assert f'id="{eid}"' in src, eid
        assert '"Reboot"' in src                  # reboot-status branch
        assert 'method: "reboot"' in src          # the reboot JSON-RPC

    def test_select_functions_store(self):
        """ref dev/SelectFunctions.jsx + store/avfunSlice.js: defaults
        merged under the web store, set_web_store on update."""
        src = _page("index.html")
        assert "AVFUN_DEFAULTS" in src
        assert "/v1/get-web-store" in src
        assert "set_web_store" in src
        # the reference's avfun groups and switches
        for k in ("calibrate_lidar_camera", "calibrate_panorama_camera",
                  "advance", "detect", "slam"):
            assert k in src, k

    def test_avfuns_gate_config_form(self):
        src = _page("index.html")
        assert "applyAvfuns" in src
        # re-applied when the structured form is (re)rendered
        assert re.search(r"if \(cfgFormMode\) applyAvfuns\(\)", src)

    def test_avfuns_gate_calibration_tabs(self):
        src = _page("calibration.html")
        for fn in ("calibrate_lidar", "calibrate_camera",
                   "calibrate_lidar_camera", "calibrate_lidar_ins",
                   "calibrate_lidar_imu", "calibrate_panorama_camera"):
            assert f'data-avfun="{fn}"' in src, fn
        assert "/v1/get-web-store" in src

    def test_log_file_browser(self):
        """ref dev/Log.jsx: file list, content view, download."""
        src = _page("index.html")
        for eid in ("logfile-sel", "logfile-dl"):
            assert f'id="{eid}"' in src, eid
        for route in ("/v1/log-file-list", "/v1/log-content",
                      "/v1/log-download"):
            assert route in src, route


class TestI18nCoverage:
    """User-visible strings carry data-i18n and resolve in the shared
    dictionary; coverage is measured, not assumed."""

    def _zh_keys(self):
        src = open(os.path.join(WWW, "i18n.js")).read()
        return set(re.findall(r'"((?:[^"\\]|\\.)+)":\s*"', src))

    @pytest.mark.parametrize("page", PAGES)
    def test_coverage_at_least_95_pct(self, page):
        html = _page(page)
        els = re.findall(
            r'<(button|th|legend|span|div|label|option)([^>]*)>'
            r'([^<{$][^<]*?)</\1>', html)
        total = covered = 0
        missing = []
        for tag, attrs, text in els:
            text = text.strip()
            if not re.search(r"[A-Za-z]{2,}", text):
                continue                      # symbols / numbers only
            if re.match(r"^\d", text):
                continue                      # numeric units (1 Hz, 0.5x)
            if re.match(r"^[A-Z]{3,8}$", text):
                continue                      # log levels DEBUG/INFO/...
            if len(text) <= 4 and " " not in text:
                continue                      # axis symbols dx/dy/yaw
            if text.endswith(("…", "...")):
                continue                      # dynamic placeholders
            total += 1
            if "data-i18n" in attrs:
                covered += 1
            else:
                missing.append(f"<{tag}>{text[:40]}")
        pct = covered / max(total, 1)
        assert pct >= 0.95, (f"{page}: i18n coverage {pct:.0%} "
                             f"({covered}/{total}); missing: {missing}")

    @pytest.mark.parametrize("page", PAGES)
    def test_all_keys_resolve(self, page):
        zh = self._zh_keys()
        for key in re.findall(r'data-i18n(?:-title)?="([^"]+)"',
                              _page(page)):
            assert key in zh, f"{page}: {key!r} missing a dictionary entry"

    def test_alias_keys_have_english_text(self):
        """Alias keys (help sentences) must resolve in BOTH languages —
        otherwise the en UI would render the raw key."""
        src = open(os.path.join(WWW, "i18n.js")).read()
        en_block = src.split("const LSD_EN")[1].split("};")[0]
        en = set(re.findall(r'"((?:[^"\\]|\\.)+)":\s*"', en_block))
        for page in PAGES:
            for key in re.findall(r'data-i18n(?:-title)?="([^"]+)"',
                                  _page(page)):
                if key.endswith("-help"):
                    assert key in en, f"alias {key!r} lacks an en entry"


@pytest.fixture
def server(tmp_path, monkeypatch):
    from lsd_tpu.runtime import clear_interfaces
    from lsd_tpu.runtime.perception import Perception
    from lsd_tpu.web import PerceptionServer
    monkeypatch.setenv("LSD_TPU_WEB_STORE", str(tmp_path / "store.json"))
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    (log_dir / "session.log").write_text("line1\nline2\n")
    monkeypatch.setenv("LSD_TPU_LOG_DIR", str(log_dir))
    clear_interfaces()
    p = Perception()
    srv = PerceptionServer(p)
    port = srv.start(host="127.0.0.1", port=0)
    yield f"http://127.0.0.1:{port}", str(log_dir)
    srv.stop()
    clear_interfaces()


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, r.read()


def _post(url, body=None):
    req = urllib.request.Request(
        url, data=json.dumps(body or {}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status, r.read()


class TestLogFileRoutes:
    """Same-origin mirrors of the upgrade daemon's log routes
    (ref rpc/http-upgrade.ts:52-56 + dev/Log.jsx downloadLog)."""

    def test_list_content_download(self, server):
        base, log_dir = server
        _, body = _get(base + "/v1/log-file-list")
        files = json.loads(body)["files"]
        target = os.path.join(log_dir, "session.log")
        assert target in files
        _, body = _get(base + "/v1/log-content?filename=" +
                       urllib.parse.quote(target))
        assert json.loads(body)["content"] == "line1\nline2\n"
        _, body = _get(base + "/v1/log-download?filename=" +
                       urllib.parse.quote(target))
        assert body == b"line1\nline2\n"

    def test_download_without_filename_ships_ring(self, server):
        base, _ = server
        from lsd_tpu.utils.log import get_logger
        get_logger("devtest").warning("ring-entry-for-download")
        _, body = _get(base + "/v1/log-download")
        assert b"ring-entry-for-download" in body

    def test_content_path_traversal_blocked(self, server):
        base, _ = server
        _, body = _get(base + "/v1/log-content?filename=/etc/passwd")
        assert json.loads(body) == {"error": "not found"}


class TestAvfunsStoreRoundtrip:
    def test_set_get_persists(self, server, tmp_path):
        base, _ = server
        avfuns = {"config": {"radar": False},
                  "calibration": {"calibrate_panorama_camera": False}}
        _, body = _post(base + "/api", {
            "method": "set_web_store", "id": 0,
            "params": {"store": {"avfuns": avfuns}}})
        assert json.loads(body)["result"] == {"avfuns": avfuns}
        _, body = _get(base + "/v1/get-web-store")
        assert json.loads(body)["avfuns"]["config"]["radar"] is False
        # persisted to disk (survives a server restart)
        persisted = json.loads((tmp_path / "store.json").read_text())
        assert persisted["avfuns"]["calibration"][
            "calibrate_panorama_camera"] is False


class TestUpgradeServerLogDownload:
    def test_log_download_route(self, tmp_path, monkeypatch):
        from lsd_tpu.web.upgrade import UpgradeManager, UpgradeServer
        log_dir = tmp_path / "lg"
        log_dir.mkdir()
        (log_dir / "a.log").write_bytes(b"payload-bytes")
        srv = UpgradeServer(UpgradeManager(log_dirs=(str(log_dir),)))
        port = srv.start(host="127.0.0.1", port=0)
        try:
            url = (f"http://127.0.0.1:{port}/v1/log-download?filename=" +
                   urllib.parse.quote(str(log_dir / "a.log")))
            _, body = _get(url)
            assert body == b"payload-bytes"
        finally:
            srv.stop()

"""Upgrade daemon (ref web_ui rpc/http-upgrade.ts contract)."""
import json
import time
import urllib.request

import pytest

from lsd_tpu.web.upgrade import (UpgradeManager, UpgradeServer,
                                 pack_firmware, parse_firmware)


def test_pack_parse_roundtrip():
    blob = pack_firmware("1.2.3", "fixes things", b"\x00payload\xff" * 100)
    meta = parse_firmware(blob)
    assert meta["valid"]
    assert meta["version"] == "1.2.3"
    assert meta["release_note"] == "fixes things"
    assert meta["payload"] == b"\x00payload\xff" * 100


def test_parse_rejects_bad_magic_and_truncation():
    assert not parse_firmware(b"NOTLSD-whatever")["valid"]
    blob = pack_firmware("9", "n", b"x")
    assert not parse_firmware(blob[:6])["valid"]


def test_manager_stages_to_success(tmp_path):
    mgr = UpgradeManager(staging_dir=str(tmp_path / "stage"),
                         step_delay=0.0)
    out = mgr.submit(pack_firmware("2.0", "note", b"firmware-bytes"))
    assert out["status"] == "ok" and out["version"] == "2.0"
    for _ in range(100):
        s = mgr.status()
        if s["stage"] in ("success", "failed"):
            break
        time.sleep(0.05)
    assert s["stage"] == "success" and s["percentage"] == 100
    meta = json.load(open(tmp_path / "stage" / "firmware-2.0.bin.meta"))
    assert meta["version"] == "2.0"
    assert (tmp_path / "stage" / "firmware-2.0.bin").read_bytes() \
        == b"firmware-bytes"


def test_manager_rejects_invalid_package(tmp_path):
    mgr = UpgradeManager(staging_dir=str(tmp_path), step_delay=0.0)
    out = mgr.submit(b"garbage")
    assert out["status"] == "error"
    assert mgr.status()["stage"] == "failed"


def test_power_action_gated(tmp_path):
    mgr = UpgradeManager(staging_dir=str(tmp_path))
    assert mgr.power_action("reboot")["status"] == "disabled"
    assert mgr.power_action("rm -rf /")["status"] == "error"


def test_log_content_path_confinement(tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "a.log").write_text("hello log")
    secret = tmp_path / "secret.txt"
    secret.write_text("nope")
    mgr = UpgradeManager(log_dirs=(str(logs),))
    assert str(logs / "a.log") in mgr.log_files()["files"]
    assert mgr.log_content(str(logs / "a.log"))["content"] == "hello log"
    assert "error" in mgr.log_content(str(secret))
    assert "error" in mgr.log_content(str(logs / ".." / "secret.txt"))


@pytest.fixture
def daemon(tmp_path):
    srv = UpgradeServer(UpgradeManager(staging_dir=str(tmp_path / "s"),
                                       step_delay=0.0))
    port = srv.start(host="127.0.0.1", port=0)
    yield f"http://127.0.0.1:{port}"
    srv.stop()


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return json.loads(r.read())


def test_daemon_http_surface(daemon):
    v = _get(daemon + "/v1/version")
    assert v["version"]["ver"]
    assert _get(daemon + "/v1/status")["stage"] == "idle"

    blob = pack_firmware("3.1", "over http", b"B" * 1024)
    req = urllib.request.Request(daemon + "/v1/firmware", data=blob)
    out = json.loads(urllib.request.urlopen(req, timeout=5).read())
    assert out["status"] == "ok"
    for _ in range(100):
        s = _get(daemon + "/v1/status")
        if s["stage"] in ("success", "failed"):
            break
        time.sleep(0.05)
    assert s["stage"] == "success"


def test_daemon_multipart_upload(daemon):
    blob = pack_firmware("4.0", "multipart", b"C" * 64)
    boundary = b"xxBOUNDARYxx"
    body = (b"--" + boundary + b"\r\n"
            b'Content-Disposition: form-data; name="file"; '
            b'filename="fw.lsd"\r\n'
            b"Content-Type: application/octet-stream\r\n\r\n"
            + blob + b"\r\n--" + boundary + b"--\r\n")
    req = urllib.request.Request(
        daemon + "/v1/firmware", data=body,
        headers={"Content-Type":
                 "multipart/form-data; boundary=xxBOUNDARYxx"})
    out = json.loads(urllib.request.urlopen(req, timeout=5).read())
    assert out["status"] == "ok" and out["version"] == "4.0"


def test_daemon_power_action(daemon):
    req = urllib.request.Request(
        daemon + "/v1/system-power-action",
        data=json.dumps({"action": "reboot"}).encode())
    out = json.loads(urllib.request.urlopen(req, timeout=5).read())
    assert out["status"] == "disabled"

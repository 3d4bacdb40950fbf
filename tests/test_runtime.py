import os
import time

import numpy as np
import pytest

from lsd_tpu.io.recorder import FrameRecorder
from lsd_tpu.proto import parse_detection, serialize_detection
from lsd_tpu.proto.wire import encode_message, decode_message
from lsd_tpu.runtime import (AttrDict, CheckResult, ConfigManager, Module,
                             ModuleManager, clear_interfaces)
from lsd_tpu.runtime.interface import call_interface, register_interface
from lsd_tpu.runtime.modules import PlayerSource, SinkModule
from lsd_tpu.runtime.perception import Perception
from tests.test_io import make_frame_dict


@pytest.fixture(autouse=True)
def _clean_interfaces():
    clear_interfaces()
    yield
    clear_interfaces()


class TestConfig:
    def test_defaults_and_attr_access(self):
        cm = ConfigManager()
        assert cm.config.slam.mode == "mapping"
        assert cm.config.pipeline == [["Source", "SLAM", "Sink"]]

    def test_check_classification(self):
        cm = ConfigManager()
        new = cm.config.to_dict()
        assert cm.check_config(new) == CheckResult.SUCCESS
        new["output"]["protocol"]["UDP"]["use"] = True
        assert cm.check_config(new) == CheckResult.SUCCESS
        new["pipeline"] = [["Source", "Sink"]]
        assert cm.check_config(new) == CheckResult.RESET
        new = cm.config.to_dict()
        new["board"]["name"] = "other"
        assert cm.check_config(new) == CheckResult.REBOOT

    def test_dump_and_reload(self, tmp_path):
        p = str(tmp_path / "cfg.yaml")
        cm = ConfigManager()
        cm.config.slam.mode = "localization"
        cm.dump(p)
        cm2 = ConfigManager(p)
        assert cm2.config.slam.mode == "localization"

    def test_overlay_recording(self, tmp_path):
        d = str(tmp_path)
        with open(os.path.join(d, "cfg.yaml"), "w") as f:
            f.write("lidar:\n- name: VLP-16\n")
        cm = ConfigManager()
        cm.overlay_recording_config(d)
        assert cm.config.lidar[0]["name"] == "VLP-16"


class TestProto:
    def test_wire_roundtrip_scalars(self):
        schema = {1: ("a", "uint32", False), 2: ("b", "double", False),
                  3: ("c", "string", False), 4: ("d", "float", True),
                  5: ("e", "int32", False)}
        msg = dict(a=300, b=-1.5, c="hi", d=[1.0, 2.0], e=-7)
        out = decode_message(schema, encode_message(schema, msg))
        assert out["a"] == 300 and out["c"] == "hi" and out["e"] == -7
        np.testing.assert_allclose(out["b"], -1.5)
        np.testing.assert_allclose(out["d"], [1.0, 2.0])

    def test_detection_roundtrip(self):
        objs = [dict(id=3, label=0, score=0.9,
                     box=np.asarray([1, 2, 0.5, 4, 2, 1.6, 0.3]),
                     velocity=np.asarray([5.0, 0.1, 0.0]), age=7, valid=True,
                     trajectory=np.zeros((20, 7)))]
        data = serialize_detection(dict(timestamp=123456, objects=objs, fps=10.0))
        out = parse_detection(data)
        assert out["header"]["timestamp"] == 123456
        o = out["object"][0]
        assert o["id"] == 3 and o["type"] == 1 and o["age"] == 7
        np.testing.assert_allclose(o["box"]["center"]["x"], 1.0)
        np.testing.assert_allclose(o["box"]["heading"], 0.3, atol=1e-6)
        assert len(o["trajectory"]) == 20

    def test_against_reference_protobuf_if_available(self):
        """Cross-check wire compatibility with the real protobuf runtime."""
        google = pytest.importorskip("google.protobuf")
        import shutil
        import subprocess
        import sys
        proto_src = "/root/reference/proto/detection.proto"
        if not (os.path.exists(proto_src) and shutil.which("protoc")):
            pytest.skip("reference .proto or protoc not available")
        import tempfile
        gen = tempfile.mkdtemp()
        r = subprocess.run(["protoc", "-I", os.path.dirname(proto_src),
                            "--python_out", gen, proto_src],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip(f"protoc failed: {r.stderr[:200]}")
        sys.path.insert(0, gen)
        try:
            import detection_pb2
        except Exception:
            pytest.skip("generated pb2 not importable")
        finally:
            sys.path.pop(0)
        objs = [dict(id=1, label=0, score=0.5,
                     box=np.asarray([1, 2, 3, 4, 2, 1.6, 0.1]),
                     velocity=np.zeros(3), age=1, valid=True, trajectory=None)]
        data = serialize_detection(dict(timestamp=42, objects=objs, fps=5.0))
        det = detection_pb2.Detection()
        det.ParseFromString(data)
        assert det.header.timestamp == 42
        assert det.object[0].id == 1
        np.testing.assert_allclose(det.object[0].box.center.y, 2.0)


class TestPipeline:
    def test_module_backpressure_drops(self):
        class Producer(Module):
            def __init__(self):
                super().__init__("P")
                self.n = 0

            def get_data(self):
                self.n += 1
                return dict(n=self.n)

        class SlowConsumer(Module):
            def __init__(self):
                super().__init__("C", queue_size=1)

        p, c = Producer(), SlowConsumer()
        p.connect(c)
        p.start_loop()
        time.sleep(0.3)
        p.stop_loop()
        assert c.drops > 0 or c.queue.qsize() >= 1

    def test_pipeline_end_to_end_replay(self, tmp_path):
        # record frames, replay them through Source->Sink, check DataBank
        rec = FrameRecorder(str(tmp_path / "rec"))
        for k in range(5):
            rec.write(make_frame_dict(ts=1000000 + k * 100000))
        cfg = ConfigManager().config
        cfg.input.data_path = rec.log_dir
        cfg.pipeline = [["Source", "Sink"]]
        mm = ModuleManager({"Source": PlayerSource, "Sink": SinkModule})
        mm.build(cfg.pipeline, cfg)
        mm.start()
        deadline = time.time() + 5.0
        bank = mm.modules["Sink"].data_bank
        while time.time() < deadline and bank.get_latest() is None:
            time.sleep(0.05)
        got = bank.get_latest()
        mm.stop()
        assert got is not None
        assert got["frame_timestamp_monotonic"] >= 1000000
        st = mm.get_status()
        assert st["modules"]["Source"]["frames"] >= 1

    def test_perception_facade(self, tmp_path):
        rec = FrameRecorder(str(tmp_path / "rec"))
        for k in range(3):
            rec.write(make_frame_dict(ts=1000000 + k * 100000))
        p = Perception()
        cfgd = p.get_config()
        cfgd["input"]["data_path"] = rec.log_dir
        cfgd["pipeline"] = [["Source", "Sink"]]
        p.config_manager.set_config(cfgd)
        p.setup()
        p.start()
        time.sleep(0.5)
        status = p.get_status()
        p.release()
        assert status["status"] == "Running"
        assert "Source" in status["modules"]
        dump = p.dump()
        assert "thread" in dump


class TestFanOutPipeline:
    def test_split_pipeline(self, tmp_path):
        """Reference-style fan-out: [[Source, Split], [Split, Sink]] plus a
        second consumer chain off the same Split."""
        from lsd_tpu.runtime.pipeline import Split, DataBank
        rec = FrameRecorder(str(tmp_path / "rec"))
        for k in range(5):
            rec.write(make_frame_dict(ts=1000000 + k * 100000))
        cfg = ConfigManager().config
        cfg.input.data_path = rec.log_dir
        cfg.pipeline = [["Source", "Split"], ["Split", "SinkA"], ["Split", "SinkB"]]
        banks = {}

        def make_bank(name):
            def f(cfg):
                b = DataBank(name)
                banks[name] = b
                return b
            return f

        mm = ModuleManager({"Source": PlayerSource,
                            "Split": lambda cfg: Split("Split"),
                            "SinkA": make_bank("SinkA"),
                            "SinkB": make_bank("SinkB")})
        mm.build(cfg.pipeline, cfg)
        mm.start()
        deadline = time.time() + 5
        while time.time() < deadline:
            if all(b.get_latest() is not None for b in banks.values()):
                break
            time.sleep(0.05)
        mm.stop()
        assert banks["SinkA"].get_latest() is not None
        assert banks["SinkB"].get_latest() is not None


def test_eval_dump_sink(tmp_path):
    import numpy as np
    from lsd_tpu.runtime import clear_interfaces
    from lsd_tpu.runtime.config import ConfigManager
    from lsd_tpu.runtime.modules import EvalDumpSink
    clear_interfaces()
    cfg = ConfigManager().config
    sink = EvalDumpSink(cfg, out_path=str(tmp_path / "dump.txt"))
    sink.start_dump()
    T = np.eye(4); T[0, 3] = 1.5
    for k in range(3):
        sink.process(dict(frame_start_timestamp=1000 + k,
                          slam_pose=T,
                          ins_data=dict(latitude=37.0 + k * 1e-5,
                                        longitude=-122.0, altitude=5.0,
                                        heading=90.0, Status=1)))
    sink.release()
    rows = open(tmp_path / "dump.txt").read().strip().splitlines()
    assert len(rows) == 3
    vals = [float(v) for v in rows[1].split()]
    assert vals[1] == 1.5          # slam x
    assert abs(vals[5]) > 0.5      # rtk northing moved ~1.1 m per 1e-5 deg
    clear_interfaces()


def test_player_status_interface(tmp_path):
    from lsd_tpu.io.recorder import FrameRecorder
    from lsd_tpu.runtime import clear_interfaces
    from lsd_tpu.runtime.config import ConfigManager
    from lsd_tpu.runtime.interface import call_interface
    from lsd_tpu.runtime.modules import PlayerSource
    from tests.test_io import make_frame_dict
    clear_interfaces()
    rec = FrameRecorder(str(tmp_path / "rec"))
    for k in range(10):
        rec.write(make_frame_dict(ts=1_000_000 + k * 1_000_000))
    cfg = ConfigManager().config
    cfg["input"]["data_path"] = rec.log_dir
    src = PlayerSource(cfg)
    src.setup(cfg)
    st = call_interface("player.get_status")
    assert st["percent"] == 0.0 and st["now_time"] == "00:00"
    assert st["left_time"] == "00:09"
    src.seek(50.0)
    st = call_interface("player.get_status")
    assert 40.0 <= st["percent"] <= 60.0
    clear_interfaces()


def test_system_utils(tmp_path):
    from lsd_tpu.utils.system import (capture_journal, init_backtrace_handle,
                                      set_thread_priority)
    import faulthandler
    init_backtrace_handle()
    assert faulthandler.is_enabled()
    # best-effort: must not raise regardless of privileges
    set_thread_priority(nice_delta=0)
    out = capture_journal(str(tmp_path))
    if out is not None:
        assert (tmp_path / "journal.txt").exists()


def test_health_checker_restarts_dead_module():
    """The checker RESTARTS crashed module threads (bounded), then
    escalates to Error (ref module_manager.py check_status — round-1
    only logged)."""
    import time
    from lsd_tpu.runtime.pipeline import Module, ModuleManager, PipelineStatus

    class Src(Module):
        def get_data(self):
            time.sleep(0.01)
            return {"n": 1}

    class Crashy(Module):
        crashes = 0

        def process(self, d):
            Crashy.crashes += 1
            raise RuntimeError("boom")

    mgr = ModuleManager({"Source": lambda cfg: Src("Source"),
                         "Crashy": lambda cfg: Crashy("Crashy")})
    mgr.check_period = 0.1
    mgr.build([["Source", "Crashy"]], cfg=None)
    mgr.start()
    try:
        deadline = time.time() + 10
        while time.time() < deadline and \
                mgr.status is not PipelineStatus.ERROR:
            time.sleep(0.05)
        assert mgr.status is PipelineStatus.ERROR
        st = mgr.get_status()
        assert st["restarts"]["Crashy"] == ModuleManager.MAX_RESTARTS
        # it actually re-ran the module after each restart
        assert Crashy.crashes >= ModuleManager.MAX_RESTARTS + 1
        assert "rss_mb" in st["resources"]
    finally:
        mgr.stop()

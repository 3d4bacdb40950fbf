"""GStreamer cap-string builder (runtime/gst_caps.py — the reference's
camera_data_manager._generate_cap_string + hardware/gstreamer templates)."""
from lsd_tpu.runtime.gst_caps import build_cap_string, usb_camera_device


def test_local_v4l2_generic():
    s = build_cap_string(dict(name="0", input_width=1280, input_height=720,
                              output_width=640, output_height=480,
                              jetson=False))
    assert s.startswith("v4l2src device=/dev/video0")
    assert "width=1280,height=720" in s
    assert "videoscale" in s and "width=640,height=480" in s
    assert s.endswith("drop=true max-buffers=2")


def test_local_v4l2_jetson_nvmm():
    s = build_cap_string(dict(name="1", input_width=1920, input_height=1080,
                              flip_method=2, jetson=True))
    assert s.startswith("nvv4l2camerasrc device=/dev/video1")
    assert "video/x-raw(memory:NVMM)" in s
    assert "nvvidconv flip-method=2" in s


def test_crop_margins():
    s = build_cap_string(dict(name="0", input_width=800, input_height=600,
                              crop=[10, 20, 30, 40], jetson=False))
    assert "videocrop top=10 bottom=20 left=30 right=40" in s
    sj = build_cap_string(dict(name="0", input_width=800, input_height=600,
                               crop=[10, 20, 30, 40], jetson=True))
    assert "top=10 bottom=580 left=30 right=760" in sj
    assert "width=730,height=570" in sj


def test_rtsp_http_flir_schemes():
    s = build_cap_string(dict(name="rtsp://10.0.0.2/stream", jetson=False))
    assert s.startswith("rtspsrc location=rtsp://10.0.0.2/stream latency=0")
    # http host:idx rewrites to the reference's :17777 mjpeg relay
    s = build_cap_string(dict(name="http://10.0.0.3:2", jetson=False))
    assert "souphttpsrc" in s and ":17777/stream?topic=2" in s
    assert "jpegdec" in s
    s = build_cap_string(dict(name="flir:0", jetson=True))
    assert s.startswith("flirsrc device=0")
    assert "nvjpegdec" not in s


def test_flip_method_mapping_generic():
    s = build_cap_string(dict(name="0", flip_method=2, jetson=False))
    assert "videoflip method=rotate-180" in s
    s = build_cap_string(dict(name="0", flip_method=0, jetson=False))
    assert "videoflip" not in s


def test_offline_and_unknown():
    assert build_cap_string(dict(name="0"), mode="offline") == ""
    assert build_cap_string(dict(name="weird://x")) == ""
    # usb scheme with no /dev/v4l/by-id -> '' (ref returns empty cap)
    assert build_cap_string(dict(name="usb:0", jetson=False)) in ("",)


def test_usb_device_listing(tmp_path, monkeypatch):
    assert usb_camera_device(0) is None or isinstance(
        usb_camera_device(0), str)

"""ipc:// transport (comms/zcm_ipc.py) — the reference's zcm core address
(InterProcess.h ipc://zcm_core)."""
import threading
import time

import numpy as np

from lsd_tpu.comms.zcm_ipc import ZcmIpcTransport, make_transport


def test_ipc_pub_sub_roundtrip():
    t_sub = ZcmIpcTransport("ipc://test_core_a")
    got = []
    ev = threading.Event()

    def on_msg(ch, payload):
        got.append((ch, payload))
        ev.set()

    t_sub.start_receiver(on_msg)
    t_pub = ZcmIpcTransport("ipc://test_core_a")
    try:
        time.sleep(0.1)
        t_pub.publish("slam.odometry", b"\x01\x02\x03hello")
        assert ev.wait(3.0)
        assert got[0] == ("slam.odometry", b"\x01\x02\x03hello")
    finally:
        t_pub.close()
        t_sub.close()


def test_ipc_large_message_fragments():
    t_sub = ZcmIpcTransport("ipc://test_core_b")
    got = []
    ev = threading.Event()
    t_sub.start_receiver(lambda ch, p: (got.append((ch, p)), ev.set()))
    t_pub = ZcmIpcTransport("ipc://test_core_b")
    try:
        time.sleep(0.1)
        payload = np.arange(200_000, dtype=np.uint8).tobytes()
        t_pub.publish("points", payload)
        assert ev.wait(3.0)
        assert got[0][0] == "points" and got[0][1] == payload
    finally:
        t_pub.close()
        t_sub.close()


def test_ipc_fanout_two_subscribers():
    subs = [ZcmIpcTransport("ipc://test_core_c") for _ in range(2)]
    evs = [threading.Event() for _ in range(2)]
    for s, e in zip(subs, evs):
        s.start_receiver(lambda ch, p, e=e: e.set())
    t_pub = ZcmIpcTransport("ipc://test_core_c")
    try:
        time.sleep(0.1)
        t_pub.publish("x", b"y")
        assert all(e.wait(3.0) for e in evs)
    finally:
        t_pub.close()
        for s in subs:
            s.close()


def test_transport_factory():
    t = make_transport("ipc://test_core_d")
    assert isinstance(t, ZcmIpcTransport)
    t.close()
    from lsd_tpu.comms.zcm_udpm import ZcmUdpmTransport
    u = make_transport("udp:127.0.0.1:47999")
    assert isinstance(u, ZcmUdpmTransport)
    u.close()

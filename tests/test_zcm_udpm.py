"""LCM/ZCM UDPM wire transport (comms/zcm_udpm.py; the reference's
ZeroCM transport format — interop with lcm-spy/zcm tooling)."""
import struct
import threading
import time

import pytest

from lsd_tpu.comms.zcm_udpm import (MAGIC_FRAG, MAGIC_SHORT,
                                    ZcmUdpmTransport, decode_datagram,
                                    encode_fragments, encode_short)


class TestWireFormat:
    def test_short_roundtrip(self):
        dgram = encode_short(7, "slam.odometry", b"\x01\x02\x03")
        kind, seq, ch, payload = decode_datagram(dgram)
        assert kind == "short" and seq == 7
        assert ch == "slam.odometry" and payload == b"\x01\x02\x03"
        # header bytes follow the LCM contract exactly
        assert struct.unpack(">I", dgram[:4])[0] == MAGIC_SHORT

    def test_fragment_roundtrip(self):
        payload = bytes(range(256)) * 40      # 10240 B -> multiple frags
        frags = encode_fragments(3, "points", payload, mtu=1400)
        assert len(frags) > 1
        assert struct.unpack(">I", frags[0][:4])[0] == MAGIC_FRAG
        # reassemble by hand through the decoder
        from lsd_tpu.comms.zcm_udpm import _Reassembler
        r = _Reassembler()
        out = None
        for f in frags:
            parsed = decode_datagram(f)
            assert parsed[0] == "frag"
            res = r.feed(("127.0.0.1", 1), parsed)
            if res is not None:
                out = res
        assert out == ("points", payload)

    def test_out_of_order_fragments(self):
        payload = b"z" * 5000
        frags = encode_fragments(9, "ch", payload, mtu=1400)
        from lsd_tpu.comms.zcm_udpm import _Reassembler
        r = _Reassembler()
        out = None
        for f in reversed(frags):
            res = r.feed(("a", 9), decode_datagram(f))
            if res is not None:
                out = res
        assert out == ("ch", payload)

    def test_garbage_rejected(self):
        assert decode_datagram(b"junk") is None
        assert decode_datagram(b"\x00" * 30) is None


class TestTransport:
    def test_udp_pub_sub_roundtrip(self):
        rxt = ZcmUdpmTransport("udp:127.0.0.1:0")
        got = []
        evt = threading.Event()

        def on_msg(ch, payload):
            got.append((ch, payload))
            evt.set()

        port = rxt.start_receiver(on_msg)
        txt = ZcmUdpmTransport(f"udp:127.0.0.1:{port}")
        txt.publish("imu_raw", b"hello")
        assert evt.wait(3.0)
        assert got[0] == ("imu_raw", b"hello")

        # large message exercises fragmentation over the socket
        evt.clear()
        big = bytes(range(256)) * 64          # 16 KB
        txt.publish("cloud", big)
        assert evt.wait(3.0)
        assert got[-1] == ("cloud", big)
        txt.close()
        rxt.close()

    def test_bus_bridge(self):
        from lsd_tpu.comms import MessageBus
        from lsd_tpu.comms.zcm_udpm import bridge_bus_to_udpm
        rxt = ZcmUdpmTransport("udp:127.0.0.1:0")
        got = []
        evt = threading.Event()
        port = rxt.start_receiver(lambda ch, p: (got.append((ch, p)),
                                                 evt.set()))
        txt = ZcmUdpmTransport(f"udp:127.0.0.1:{port}")
        bus = MessageBus()
        sub = bridge_bus_to_udpm(bus, txt)
        bus.publish("slam.nav", b"\x05\x06")
        assert evt.wait(3.0)
        assert got[0] == ("slam.nav", b"\x05\x06")
        txt.close()
        rxt.close()

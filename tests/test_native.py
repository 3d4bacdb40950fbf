import socket
import struct
import time

import numpy as np
import pytest

native = pytest.importorskip("lsd_tpu.native")


@pytest.fixture(scope="module")
def lib():
    try:
        return native.get_lib()
    except Exception as e:
        pytest.skip(f"native build failed: {e}")


def make_custom_packet(pts: np.ndarray, stamp_us: int = 123456789) -> bytes:
    pts = np.asarray(pts, np.float32).reshape(-1, 4)
    return struct.pack("<IIQ", 0x4C53444C, len(pts), stamp_us) + pts.tobytes()


def make_vlp16_packet(dist_m: float = 10.0, azimuth_deg: float = 90.0,
                      intensity: int = 100) -> bytes:
    pkt = bytearray(1206)
    for b in range(12):
        off = b * 100
        pkt[off:off + 2] = b"\xff\xee"
        az = int(azimuth_deg * 100) % 36000
        pkt[off + 2:off + 4] = struct.pack("<H", az)
        for rec in range(32):
            r = off + 4 + rec * 3
            pkt[r:r + 2] = struct.pack("<H", int(dist_m / 0.002))
            pkt[r + 2] = intensity
    return bytes(pkt)


class TestUdpIngest:
    def test_capture_and_decode_custom(self, lib):
        rx = native.UdpReceiver(0)  # port 0 fails bind? use fixed ephemeral
        rx.close()
        port = 28999
        rx = native.UdpReceiver(port)
        try:
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            pts = np.asarray([[1.0, 2.0, 0.5, 0.9], [-3.0, 0.1, 1.0, 0.2]], np.float32)
            for _ in range(3):
                tx.sendto(make_custom_packet(pts), ("127.0.0.1", port))
            deadline = time.time() + 2.0
            got = 0
            while time.time() < deadline and got < 3:
                pk, lens = rx.pop()
                if len(lens):
                    out, stamp = native.decode_custom(pk, lens)
                    got += len(lens)
                    np.testing.assert_allclose(out[:2], pts, atol=1e-6)
                    assert stamp == 123456789
                time.sleep(0.01)
            assert got >= 3
            received, dropped = rx.stats()
            assert received >= 3 and dropped == 0
        finally:
            rx.close()

    def test_decode_vlp16_geometry(self, lib):
        pkt = make_vlp16_packet(dist_m=10.0, azimuth_deg=90.0)
        buf = np.zeros((1, 2048), np.uint8)
        buf[0, :1206] = np.frombuffer(pkt, np.uint8)
        out = native.decode_vlp16(buf, np.asarray([1206], np.uint32))
        # 12 blocks x 2 seq x 16 ch = 384 returns
        assert len(out) == 384
        r = np.linalg.norm(out[:, :3], axis=1)
        np.testing.assert_allclose(r, 10.0, atol=0.01)
        # azimuth 90 deg => +x direction (Velodyne: x = d sin(az), y = d cos(az))
        ch0 = out[0]  # first channel: elev -15 deg
        assert ch0[0] > 9.0 and abs(ch0[1]) < 0.3
        np.testing.assert_allclose(ch0[2], -10.0 * np.sin(np.deg2rad(15.0)), atol=0.05)
        np.testing.assert_allclose(out[:, 3], 100 / 255.0, atol=1e-6)

    def test_decode_rejects_garbage(self, lib):
        buf = np.random.default_rng(0).integers(0, 255, (4, 2048), np.uint8).astype(np.uint8)
        out = native.decode_vlp16(buf, np.full(4, 999, np.uint32))
        assert len(out) == 0
        out2, _ = native.decode_custom(buf, np.full(4, 2048, np.uint32))
        assert len(out2) == 0


class TestPostprocess:
    def test_transform_and_range_filter(self, lib):
        pts = np.asarray([[1, 0, 0, 0.5], [50, 0, 0, 0.5], [0.1, 0, 0, 0.5]], np.float32)
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 2.0  # shift +2 in x
        out = native.points_postprocess(pts, T=T, range_min=1.0, range_max=20.0)
        # 1+2=3 (keep), 50+2=52 (too far), 0.1+2=2.1 (keep)
        assert len(out) == 2
        np.testing.assert_allclose(sorted(out[:, 0].tolist()), [2.1, 3.0], atol=1e-5)

    def test_exclude_box(self, lib):
        pts = np.asarray([[1, 0, 0, 0], [5, 5, 0, 0]], np.float32)
        box = np.asarray([-2, 2, -2, 2, -2, 2], np.float32)  # vehicle body
        out = native.points_postprocess(pts, range_min=0.0, range_max=100.0,
                                        exclude_box=box)
        assert len(out) == 1
        assert out[0, 0] == 5.0


def make_rs16_packet(dist_m=10.0, azimuth_deg=90.0, intensity=80):
    pkt = bytearray(1248)
    for b in range(12):
        off = 42 + b * 100
        pkt[off:off + 2] = b"\xff\xee"
        az = int(azimuth_deg * 100) % 36000
        pkt[off + 2:off + 4] = az.to_bytes(2, "big")
        for rec in range(32):
            r = off + 4 + rec * 3
            pkt[r:r + 2] = int(dist_m / 0.0025).to_bytes(2, "big")
            pkt[r + 2] = intensity
    return bytes(pkt)


def make_livox_packet(pts_mm, refl=120, stamp_ns=987654321):
    hdr = bytearray(18)
    hdr[9] = 2  # data type: cartesian
    hdr[10:18] = int(stamp_ns).to_bytes(8, "little")
    body = bytearray()
    for (x, y, z) in pts_mm:
        body += int(x).to_bytes(4, "little", signed=True)
        body += int(y).to_bytes(4, "little", signed=True)
        body += int(z).to_bytes(4, "little", signed=True)
        body += bytes([refl, 0])
    return bytes(hdr + body)


class TestMoreDecoders:
    def test_rs16(self, lib):
        pkt = make_rs16_packet(dist_m=20.0, azimuth_deg=0.0)
        buf = np.zeros((1, 2048), np.uint8)
        buf[0, :1248] = np.frombuffer(pkt, np.uint8)
        out = native.decode_rs16(buf, np.asarray([1248], np.uint32))
        assert len(out) == 384
        r = np.linalg.norm(out[:, :3], axis=1)
        np.testing.assert_allclose(r, 20.0, atol=0.02)
        # azimuth 0 -> +y direction per x=d*sin(az), y=d*cos(az)
        ch0 = out[0]
        assert ch0[1] > 19.0 and abs(ch0[0]) < 0.3

    def test_livox(self, lib):
        pkt = make_livox_packet([(1000, -2000, 500), (0, 0, 0), (3000, 0, 0)])
        buf = np.zeros((1, 2048), np.uint8)
        buf[0, :len(pkt)] = np.frombuffer(pkt, np.uint8)
        out, stamp = native.decode_livox(buf, np.asarray([len(pkt)], np.uint32))
        assert stamp == 987654321
        assert len(out) == 2  # zero point skipped
        np.testing.assert_allclose(out[0, :3], [1.0, -2.0, 0.5], atol=1e-6)
        np.testing.assert_allclose(out[0, 3], 120 / 255.0, atol=1e-6)

    def test_decoder_registry(self, lib):
        assert set(native.DECODERS) >= {"VLP-16", "RS-16", "Livox-Mid-360", "Custom"}


def make_ouster_packet(n_beams=64, range_m=15.0, encoder=22528, refl=200):
    import struct as st
    block_size = 16 + n_beams * 12 + 4
    pkt = bytearray(16 * block_size)
    for b in range(16):
        off = b * block_size
        pkt[off:off + 8] = st.pack("<Q", 1000 + b)
        pkt[off + 8:off + 10] = st.pack("<H", b)
        pkt[off + 10:off + 12] = st.pack("<H", 1)
        pkt[off + 12:off + 16] = st.pack("<I", (encoder + b * 88) % 90112)
        for ch in range(n_beams):
            r = off + 16 + ch * 12
            pkt[r:r + 4] = st.pack("<I", int(range_m * 1000))
            pkt[r + 4:r + 6] = st.pack("<H", refl)
        pkt[off + block_size - 4:off + block_size] = st.pack("<I", 0xFFFFFFFF)
    return bytes(pkt)


class TestOuster:
    def test_decode_geometry(self, lib):
        n_beams = 64
        pkt = make_ouster_packet(n_beams=n_beams, range_m=15.0, encoder=0)
        size = len(pkt)
        buf = np.zeros((1, size), np.uint8)
        buf[0] = np.frombuffer(pkt, np.uint8)
        alt, az = native.ouster_beam_tables(n_beams, fov_deg=45.0)
        out = native.decode_ouster(buf, np.asarray([size], np.uint32),
                                   beam_alt_deg=alt, beam_az_deg=az)
        assert len(out) == 16 * n_beams
        r = np.linalg.norm(out[:, :3], axis=1)
        np.testing.assert_allclose(r, 15.0, atol=0.01)
        # first block: encoder 0 -> azimuth 2pi -> +x
        first = out[:n_beams]
        assert np.all(first[:, 0] > 10.0)
        # elevation spread covers the fov
        z = first[:, 2]
        assert z.max() > 5.0 and z.min() < -5.0
        np.testing.assert_allclose(out[:, 3], min(200 / 255.0, 1.0), atol=1e-6)

    def test_receiver_large_packets(self, lib):
        import socket as sk
        size = native.OUSTER_PACKET_BYTES[64]
        rx = native.UdpReceiver(28887, max_packet=16384)
        try:
            tx = sk.socket(sk.AF_INET, sk.SOCK_DGRAM)
            pkt = make_ouster_packet()
            tx.sendto(pkt, ("127.0.0.1", 28887))
            import time as t
            deadline = t.time() + 2
            got = 0
            while t.time() < deadline and not got:
                pk, lens = rx.pop(8)
                if len(lens):
                    assert lens[0] == size
                    out = native.decode_ouster(pk, lens)
                    got = len(out)
                t.sleep(0.01)
            assert got == 16 * 64
        finally:
            rx.close()


def make_lsc16_packet(dist_m=10.0, azimuth_deg=0.0, intensity=77):
    pkt = bytearray(1206)
    for b in range(12):
        off = b * 100
        pkt[off:off + 2] = b"\xff\xee"  # 0xEEFF little-endian
        az = int(azimuth_deg * 100) % 36000
        pkt[off + 2:off + 4] = az.to_bytes(2, "little")
        for rec in range(32):
            r = off + 4 + rec * 3
            pkt[r:r + 2] = int(dist_m / 0.01).to_bytes(2, "little")
            pkt[r + 2] = intensity
    return bytes(pkt)


def make_rs32_packet(dist_m=20.0, azimuth_deg=0.0, intensity=60):
    pkt = bytearray(1248)
    pkt[0:8] = (0xA050A55A0A05AA55).to_bytes(8, "little")
    for b in range(12):
        off = 42 + b * 100
        pkt[off:off + 2] = b"\xff\xee"
        az = int(azimuth_deg * 100) % 36000
        pkt[off + 2:off + 4] = az.to_bytes(2, "big")
        for rec in range(32):
            r = off + 4 + rec * 3
            pkt[r:r + 2] = int(dist_m / 0.005).to_bytes(2, "big")
            pkt[r + 2] = intensity
    return bytes(pkt)


def make_rs_ruby_packet(dist_m=30.0, azimuth_deg=0.0, intensity=50):
    pkt = bytearray(1248)
    pkt[0:4] = (0x5A05AA55).to_bytes(4, "little")
    blk_size = 4 + 80 * 3
    for b in range(4):
        off = 80 + b * blk_size
        pkt[off] = 0xFE
        az = int(azimuth_deg * 100) % 36000
        pkt[off + 2:off + 4] = az.to_bytes(2, "big")
        for rec in range(80):
            r = off + 4 + rec * 3
            pkt[r:r + 2] = int(dist_m / 0.005).to_bytes(2, "big")
            pkt[r + 2] = intensity
    return bytes(pkt)


def make_rs_helios_packet(dist_m=25.0, azimuth_deg=0.0, intensity=40):
    pkt = bytearray(1248)
    pkt[0:4] = (0x5A05AA55).to_bytes(4, "little")
    for b in range(12):
        off = 42 + b * 100
        pkt[off:off + 2] = b"\xff\xee"
        az = int(azimuth_deg * 100) % 36000
        pkt[off + 2:off + 4] = az.to_bytes(2, "big")
        for rec in range(32):
            r = off + 4 + rec * 3
            pkt[r:r + 2] = int(dist_m / 0.0025).to_bytes(2, "big")
            pkt[r + 2] = intensity
    return bytes(pkt)


def make_rs_m1_packet(dist_m=40.0, pitch_deg=5.0, yaw_deg=10.0, intensity=90):
    pkt = bytearray(1210)
    pkt[0:4] = (0xA55AAA55).to_bytes(4, "little")
    blk_size = 2 + 5 * 9
    for b in range(25):
        off = 32 + b * blk_size
        for ch in range(5):
            r = off + 2 + ch * 9
            pkt[r:r + 2] = int(dist_m / 0.005).to_bytes(2, "big")
            pkt[r + 2:r + 4] = (int(pitch_deg * 100) + 32768).to_bytes(2, "big")
            pkt[r + 4:r + 6] = (int(yaw_deg * 100) + 32768).to_bytes(2, "big")
            pkt[r + 6] = intensity
    return bytes(pkt)


def make_ouster_v3_packet(rings=32, range_mm=15000, m_id0=0, signal=1024):
    import struct as st
    col_bytes = 12 + rings * 12
    pkt = bytearray(32 + 16 * col_bytes)
    st.pack_into("<H", pkt, 0, 1)     # packet_type
    st.pack_into("<H", pkt, 2, 7)     # frame_id
    for c in range(16):
        off = 32 + c * col_bytes
        st.pack_into("<Q", pkt, off, 5000 + c)
        st.pack_into("<H", pkt, off + 8, (m_id0 + c) % 1024)
        st.pack_into("<H", pkt, off + 10, 1)  # status: valid
        for ch in range(rings):
            r = off + 12 + ch * 12
            st.pack_into("<I", pkt, r, range_mm)
            st.pack_into("<H", pkt, r + 6, signal)
    return bytes(pkt)


def _decode_one(fn, pkt, **kw):
    buf = np.zeros((1, max(2048, len(pkt))), np.uint8)
    buf[0, :len(pkt)] = np.frombuffer(pkt, np.uint8)
    return fn(buf, np.asarray([len(pkt)], np.uint32), **kw)


class TestNewDecoders:
    def test_lsc16(self, lib):
        out = _decode_one(native.decode_lsc16, make_lsc16_packet(dist_m=10.0))
        assert len(out) == 384
        r = np.linalg.norm(out[:, :3], axis=1)
        np.testing.assert_allclose(r, 10.0, atol=0.02)
        np.testing.assert_allclose(out[:, 3], 77 / 255.0, atol=1e-6)
        # 16 distinct elevations spanning -15..15 deg
        z = np.unique(np.round(out[:, 2], 3))
        assert z.min() < -2.5 and z.max() > 2.5

    def test_rs32(self, lib):
        out = _decode_one(native.decode_rs32, make_rs32_packet(dist_m=20.0))
        assert len(out) == 384
        # xy radius ~ dist*cos(vert) + lens-center correction
        r = np.linalg.norm(out[:, :3], axis=1)
        np.testing.assert_allclose(r, 20.0, atol=0.1)
        # vertical calibration spans -25 deg (channel 16) to +15 deg
        z = out[:, 2]
        assert z.min() < -6.0 and z.max() > 4.0

    def test_rs_ruby(self, lib):
        out = _decode_one(native.decode_rs_ruby, make_rs_ruby_packet(dist_m=30.0))
        assert len(out) == 4 * 80
        r = np.linalg.norm(out[:, :3], axis=1)
        np.testing.assert_allclose(r, 30.0, atol=0.1)

    def test_rs_helios_32_and_16p(self, lib):
        pkt = make_rs_helios_packet(dist_m=25.0)
        out32 = _decode_one(native.decode_rs_helios, pkt, n_lasers=32)
        out16 = _decode_one(native.decode_rs_helios, pkt, n_lasers=16)
        assert len(out32) == 384 and len(out16) == 384
        np.testing.assert_allclose(np.linalg.norm(out32[:, :3], axis=1),
                                   25.0, atol=0.1)
        # Helios-32 covers -25 deg; the 16P ladder only -15..15
        assert out32[:, 2].min() < -8.0
        assert out16[:, 2].min() > -8.0

    def test_rs_m1(self, lib):
        out = _decode_one(native.decode_rs_m1,
                          make_rs_m1_packet(dist_m=40.0, pitch_deg=5.0,
                                            yaw_deg=10.0))
        assert len(out) == 125
        np.testing.assert_allclose(np.linalg.norm(out[:, :3], axis=1),
                                   40.0, atol=0.05)
        exp_z = 40.0 * np.sin(np.deg2rad(5.0))
        np.testing.assert_allclose(out[:, 2], exp_z, atol=0.02)
        exp_y = 40.0 * np.cos(np.deg2rad(5.0)) * np.sin(np.deg2rad(10.0))
        np.testing.assert_allclose(out[:, 1], exp_y, atol=0.02)

    def test_ouster_v3(self, lib):
        rings = 32
        pkt = make_ouster_v3_packet(rings=rings, range_mm=15000)
        alt, az = native.ouster_beam_tables(rings, fov_deg=45.0)
        out = _decode_one(native.decode_ouster_v3, pkt, rings=rings,
                          beam_alt_deg=alt, beam_az_deg=az)
        assert len(out) == 16 * rings
        r = np.linalg.norm(out[:, :3], axis=1)
        np.testing.assert_allclose(r, 15.0, atol=0.05)
        z = out[:rings, 2]
        assert z.max() > 5.0 and z.min() < -5.0
        np.testing.assert_allclose(out[:, 3], 1024 / 2048.0, atol=1e-6)

    def test_full_registry(self, lib):
        expected = {"VLP-16", "LS-C-16", "RS-16", "RS-32", "RS-Ruby-Lite",
                    "RS-Helios", "RS-Helios-16P", "RS-M1", "Livox-Mid-360",
                    "Ouster-OS1", "Ouster-OS1-128", "Ouster-OS2-128",
                    "Ouster-OS1-128-v3", "Custom"}
        assert expected <= set(native.DECODERS)


class TestPacketRelay:
    def test_relay_mirrors_datagrams(self):
        """Package transfer (ref lidar_driver.cpp:368-375): every datagram
        received on A is forwarded to the configured destination."""
        import socket
        import time
        from lsd_tpu import native
        rx_a = native.UdpReceiver(28897)
        rx_b = native.UdpReceiver(28898)
        try:
            rx_a.start_relay("127.0.0.1", 28898)
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            payload = b"\xde\xad\xbe\xef" * 10
            deadline = time.time() + 5.0
            got = None
            while time.time() < deadline and got is None:
                tx.sendto(payload, ("127.0.0.1", 28897))
                time.sleep(0.02)
                pk, lens = rx_b.pop(8)
                if len(lens):
                    got = bytes(pk[0][: lens[0]])
            assert got == payload
            # stop: no further mirroring
            rx_a.stop_relay()
            while rx_b.pop(64)[1].size:
                pass
            tx.sendto(payload, ("127.0.0.1", 28897))
            time.sleep(0.2)
            _, lens = rx_b.pop(8)
            assert len(lens) == 0
        finally:
            rx_a.close()
            rx_b.close()

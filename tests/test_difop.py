"""RoboSense DIFOP angle-calibration parsing + live rebinding
(ref sensor_driver/lidar_driver/src/rs_decode_difop.cpp)."""
import socket
import time

import numpy as np
import pytest

from lsd_tpu.io.rs_difop import (HELIOS_DIFOP_LEN, build_rs_difop,
                                 parse_rs_difop)


class TestDifopCodec:
    def test_roundtrip(self):
        vert = np.arange(-1500, 1700, 100, dtype=np.int32)   # 32 entries
        horiz = np.arange(-320, 320, 20, dtype=np.int32)
        pkt = build_rs_difop(vert, horiz, rpm=1200, fov=(10.0, 350.0),
                             return_mode=3)
        assert len(pkt) == HELIOS_DIFOP_LEN
        info = parse_rs_difop(pkt)
        assert info["rpm"] == 1200
        assert info["fov_start_deg"] == pytest.approx(10.0)
        assert info["fov_end_deg"] == pytest.approx(350.0)
        assert info["return_mode"] == 3
        np.testing.assert_array_equal(info["vert_cd"], vert)
        np.testing.assert_array_equal(info["horiz_cd"], horiz)

    def test_n_lasers_subset(self):
        vert = np.arange(32, dtype=np.int32) * 10
        pkt = build_rs_difop(vert, -vert)
        info = parse_rs_difop(pkt, n_lasers=16)
        assert len(info["vert_cd"]) == 16
        np.testing.assert_array_equal(info["vert_cd"], vert[:16])

    def test_rejects_bad_packets(self):
        assert parse_rs_difop(b"\x00" * HELIOS_DIFOP_LEN) is None   # bad id
        assert parse_rs_difop(b"\xa5" + b"\x00" * 100) is None      # short
        # uninitialized flash (sign = 0xFF)
        pkt = bytearray(build_rs_difop(np.zeros(32), np.zeros(32)))
        pkt[468] = 0xFF
        assert parse_rs_difop(bytes(pkt)) is None
        # out-of-range angle (>= 90 deg)
        assert parse_rs_difop(build_rs_difop([9500] + [0] * 31,
                                             np.zeros(32))) is None


class TestDifopLiveRebind:
    def test_helios_unit_loads_difop(self):
        pytest.importorskip("lsd_tpu.native")
        from lsd_tpu.runtime.lidar_source import LidarUnit
        from tests.test_native import make_rs_helios_packet

        unit = LidarUnit(name="hel", port=28893, decoder="RS-Helios",
                         range_min=0.1, range_max=200.0)
        try:
            assert not unit.difop_loaded
            tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            # shift every beam up 5 deg vs the factory ladder
            vert = np.full(32, 500, np.int32)
            horiz = np.zeros(32, np.int32)
            difop = build_rs_difop(vert, horiz)
            msop = make_rs_helios_packet(dist_m=25.0)
            deadline = time.time() + 5.0
            while time.time() < deadline and not unit.difop_loaded:
                tx.sendto(difop, ("127.0.0.1", 28894))
                time.sleep(0.02)
                unit.poll()
            assert unit.difop_loaded
            # decode one data packet with the calibrated tables: all beams
            # at +5 deg pitch -> points have z = r * sin(5 deg) > 0
            unit._chunks = []
            deadline = time.time() + 5.0
            pts = np.zeros((0, 4))
            while time.time() < deadline and not len(pts):
                tx.sendto(msop, ("127.0.0.1", 28893))
                time.sleep(0.02)
                unit.poll()
                pts = np.concatenate(unit._chunks) if unit._chunks else pts
            assert len(pts)
            r = np.linalg.norm(pts[:, :3], axis=1)
            expect_z = r * np.sin(np.deg2rad(5.0))
            np.testing.assert_allclose(pts[:, 2], expect_z,
                                       atol=float(r.max()) * 0.02)
        finally:
            unit.close()

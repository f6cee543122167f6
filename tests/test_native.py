"""Tests for the native C host kernels (with fallback parity)."""
import time

import numpy as np
import pytest

from hyper_graph_nets_tpu import native


class TestNative:
    def test_library_compiles(self):
        # the CI image ships a C toolchain; the fallback covers hosts without
        assert native.available(), "native library failed to compile/load"

    def test_crc32c_test_vectors(self):
        # RFC 3720 vectors
        assert native.crc32c(b"\x00" * 32) == 0x8A9136AA
        assert native.crc32c(b"\xff" * 32) == 0x62A8AB43
        assert native.crc32c(bytes(range(32))) == 0x46DD794E

    def test_crc32c_matches_numpy_fallback(self):
        rng = np.random.RandomState(0)
        for n in (0, 1, 7, 8, 9, 1000, 4097):
            data = rng.bytes(n)
            got = native.crc32c(data)
            # numpy reference (table-driven per byte)
            from hyper_graph_nets_tpu.data.tfrecord import _CRC_TABLE

            crc = np.uint32(0xFFFFFFFF)
            for b in np.frombuffer(data, np.uint8):
                crc = _CRC_TABLE[(crc ^ b) & np.uint32(0xFF)] ^ (crc >> np.uint32(8))
            want = int(crc ^ np.uint32(0xFFFFFFFF))
            assert got == want, n

    def test_csr_matches_python(self):
        rng = np.random.RandomState(1)
        receivers = np.sort(rng.randint(0, 50, 300)).astype(np.int32)
        mask = (rng.rand(300) > 0.2).astype(np.float32)
        gi_n, gv_n = native.csr_from_receivers(receivers, 50, mask)

        # python reference (the fallback path in core/mesh.py)
        valid_edges = mask > 0
        counts = np.bincount(receivers[valid_edges], minlength=50)
        d_max = max(int(counts.max(initial=0)), 1)
        gi_p = np.zeros((50, d_max), np.int32)
        gv_p = np.zeros((50, d_max), np.float32)
        cursor = np.zeros(50, np.int32)
        for e in np.nonzero(valid_edges)[0]:
            r = receivers[e]
            gi_p[r, cursor[r]] = e
            gv_p[r, cursor[r]] = 1.0
            cursor[r] += 1
        np.testing.assert_array_equal(gi_n, gi_p)
        np.testing.assert_array_equal(gv_n, gv_p)

    def test_csr_min_degree(self):
        receivers = np.asarray([0, 0, 1], np.int32)
        gi, gv = native.csr_from_receivers(receivers, 3, min_degree=8)
        assert gi.shape == (3, 8)
        assert gv[0].sum() == 2 and gv[2].sum() == 0

    def test_crc_throughput_sane(self):
        data = np.random.RandomState(0).bytes(4 << 20)  # 4 MB
        t0 = time.perf_counter()
        native.crc32c(data)
        dt = time.perf_counter() - t0
        # native slice-by-8 should stream well over 100 MB/s
        assert (4 / max(dt, 1e-9)) > 100, f"{4/dt:.1f} MB/s"

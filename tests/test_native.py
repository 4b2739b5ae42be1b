"""Native host-runtime tests (ring buffer, file streaming, deinterleave).

Covers the C++ analog of the reference's BufferPool/FileReader host substrate
(SURVEY.md section 2.3).  Skipped wholesale if no toolchain is available.
"""

import numpy as np
import pytest

from tpusdr.io import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native library unavailable"
)


class TestRing:
    def test_write_read_roundtrip(self):
        r = native.NativeRing(1 << 16)
        data = np.arange(1000, dtype=np.uint8)
        assert r.write(data)
        out = r.read(1000)
        np.testing.assert_array_equal(out, data)

    def test_wraparound(self):
        r = native.NativeRing(1024)
        for i in range(10):
            blk = np.full(600, i, dtype=np.uint8)
            assert r.write(blk)
            out = r.read(600)
            np.testing.assert_array_equal(out, blk)

    def test_drop_on_overrun(self):
        r = native.NativeRing(1024)
        assert r.write(np.zeros(1000, np.uint8))
        assert not r.write(np.zeros(1000, np.uint8))  # dropped
        assert r.dropped == 1

    def test_read_timeout(self):
        r = native.NativeRing(1024)
        assert r.read(10, timeout_ms=50) is None

    def test_close_unblocks(self):
        import threading

        r = native.NativeRing(1024)
        results = []

        def reader():
            results.append(r.read(100, timeout_ms=5000))

        t = threading.Thread(target=reader)
        t.start()
        r.close()
        t.join(timeout=2)
        assert not t.is_alive()
        assert results == [None]


class TestFileStream:
    def test_playback(self, tmp_path):
        path = str(tmp_path / "capture.iq")
        rng = np.random.default_rng(0)
        data = rng.integers(-128, 128, size=2 * 4096 * 4, dtype=np.int8)
        data.tofile(path)
        fs = native.NativeFileStream(path, block_samples=4096, input_format="int8")
        blocks = list(fs)
        fs.close()
        assert len(blocks) == 4
        np.testing.assert_array_equal(np.concatenate(blocks), data)


class TestConvert:
    def test_deinterleave_i8(self):
        rng = np.random.default_rng(1)
        x = rng.integers(-128, 128, size=2048, dtype=np.int8)
        re, im = native.deinterleave_to_planes(x)
        np.testing.assert_allclose(re, x[0::2] / 128.0, atol=1e-7)
        np.testing.assert_allclose(im, x[1::2] / 128.0, atol=1e-7)

    def test_deinterleave_f32(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal(2048).astype(np.float32)
        re, im = native.deinterleave_to_planes(x)
        np.testing.assert_array_equal(re, x[0::2])
        np.testing.assert_array_equal(im, x[1::2])

    def test_f32_to_i16(self):
        x = np.array([-1.5, -1.0, 0.0, 0.5, 1.0, 1.5], np.float32)
        out = native.f32_to_i16(x)
        np.testing.assert_array_equal(out, [-32768, -32767, 0, 16384, 32767, 32767])


class TestIngestThroughput:
    """Sustained host-side ingest must clear the reference's real-time
    design point (20 Msps complex int8, nbfm_test.cpp:415) with the GIL-free
    path: NativeFileStream read-ahead + C deinterleave (VERDICT r1 next
    #10).  The bar is coarse (a memcpy-class loop on any modern host) so
    this is a wiring check, not a perf microbench."""

    def test_native_file_ingest_over_20msps(self, tmp_path):
        import time

        if not native.native_available():
            pytest.skip("native library unavailable")
        path = str(tmp_path / "cap.iq")
        rng = np.random.default_rng(3)
        total = 40_000_000  # 20M complex samples of int8 IQ
        rng.integers(-128, 128, size=total, dtype=np.int8).tofile(path)

        tick = 1 << 20
        stream = native.NativeFileStream(path, tick, "int8")
        t0 = time.perf_counter()
        samples = 0
        for raw in stream:
            re, im = native.deinterleave_to_planes(raw)
            samples += len(re)
        dt = time.perf_counter() - t0
        stream.close()
        msps = samples / dt / 1e6
        assert samples == (total // 2 // tick) * tick
        assert msps >= 20.0, f"native ingest {msps:.1f} Msps < 20 Msps"

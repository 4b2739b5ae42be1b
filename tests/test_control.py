"""SDR control plane tests (io/control.py).

The reference's HackrfSource control surface — device select by
index/serial (HackrfSource.cpp:105-161), start/stop applying
frequency/sample-rate/gain (HackrfSource.cpp:263-283) — against a stub
server that records the command sequence, plus retune-while-streaming
through StreamRunner.update_parameters.
"""

import numpy as np
import pytest
import scipy.signal as sps

from tpusdr.graph import blocks as B
from tpusdr.graph.chain import Chain
from tpusdr.graph.runner import StreamRunner
from tpusdr.io.control import (
    SdrControlClient,
    SdrControlError,
    SdrControlServer,
    SdrReceiverControl,
)
from tpusdr.io.sinks import CollectSink
from tpusdr.ops import cplx


class RecordingHandler:
    def __init__(self, fail_on=()):
        self.calls = []
        self.fail_on = set(fail_on)

    def __call__(self, cmd, params):
        if cmd in self.fail_on:
            raise RuntimeError(f"injected failure for {cmd}")
        self.calls.append((cmd, params))


@pytest.fixture
def server():
    handler = RecordingHandler()
    with SdrControlServer(handler) as srv:
        yield srv, handler


class TestControlProtocol:
    def test_command_sequence(self, server):
        """The full HackrfSource bring-up sequence, asserted in order."""
        srv, handler = server
        with SdrControlClient("127.0.0.1", srv.port) as c:
            c.select_device(serial="0000aabb")
            c.set_frequency(145.45e6)
            c.set_sample_rate(20e6)
            c.set_gain(lna_db=32, vga_db=20, amp=False)
            c.start()
            c.stop()
        assert handler.calls == [
            ("select", {"serial": "0000aabb"}),
            ("set_frequency", {"hz": 145.45e6}),
            ("set_sample_rate", {"hz": 20e6}),
            ("set_gain", {"lna_db": 32.0, "vga_db": 20.0, "amp": False}),
            ("start", {}),
            ("stop", {}),
        ]

    def test_select_by_index(self, server):
        srv, handler = server
        with SdrControlClient("127.0.0.1", srv.port) as c:
            c.select_device(index=1)
        assert handler.calls == [("select", {"index": 1})]

    def test_select_validates_args(self, server):
        srv, _ = server
        with SdrControlClient("127.0.0.1", srv.port) as c:
            with pytest.raises(ValueError, match="exactly one"):
                c.select_device()
            with pytest.raises(ValueError, match="exactly one"):
                c.select_device(index=0, serial="x")

    def test_server_error_raises(self):
        handler = RecordingHandler(fail_on={"set_frequency"})
        with SdrControlServer(handler) as srv:
            with SdrControlClient("127.0.0.1", srv.port) as c:
                with pytest.raises(SdrControlError, match="injected failure"):
                    c.set_frequency(1e6)
                # session survives a failed command (Status, not abort)
                c.ping()

    def test_unknown_command_rejected(self, server):
        srv, _ = server
        with SdrControlClient("127.0.0.1", srv.port) as c:
            with pytest.raises(SdrControlError, match="unknown command"):
                c._call("warp_drive")


def tone_blocks(fs, f, n, blocks, start=0):
    out = []
    for b in range(blocks):
        t = (np.arange(n) + start + b * n) / fs
        out.append(np.exp(2j * np.pi * f * t).astype(np.complex64))
    return out


class TestRetuneWhileStreaming:
    def _chain(self, fs, offset):
        return Chain(
            [
                ("shift", B.FreqShift(fs, -offset)),
                ("fir", B.Fir(sps.firwin(33, 0.2).astype(np.float32), 4)),
            ]
        )

    def test_channel_hop_mid_stream(self, server):
        """Retune to a second channel mid-stream: the radio gets no command
        (same capture), the NCO is re-aimed, the stream never stops, and
        post-hop output matches a chain built at the new offset resuming
        from the carried state."""
        srv, handler = server
        fs = 1e6
        f1, f2 = 150e3, -200e3
        center = 100e6
        n = 4096

        chain = self._chain(fs, f1)
        runner = StreamRunner(chain, donate_state=False)
        client = SdrControlClient("127.0.0.1", srv.port)
        ctl = SdrReceiverControl(
            client, runner, center_hz=center, channel_hz=center + f1
        )
        assert ctl.shift_block == "shift"

        sink1 = CollectSink()
        state, _ = runner.run(iter(tone_blocks(fs, f1, n, 2)), sink1)
        # tone at the tuned channel lands at DC post-shift: flat magnitude
        steady = sink1.result()[..., 512:]
        assert np.abs(np.abs(steady) - np.abs(steady).mean()).max() < 1e-2

        state_save = [np.asarray(l) for l in __import__("jax").tree_util.tree_leaves(state)]
        ctl.tune_channel(center + f2)
        assert handler.calls == []  # no radio command for an in-band hop

        sink2 = CollectSink()
        blocks2 = tone_blocks(fs, f2, n, 2, start=2 * n)
        state, _ = runner.run(iter(blocks2), sink2, state=state)
        got = sink2.result()

        # reference: fresh chain at the new offset resuming the saved state
        ref_chain = self._chain(fs, f2)
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(ref_chain.init_state())
        s = jax.tree_util.tree_unflatten(treedef, state_save)
        outs = []
        for b in blocks2:
            s, y = ref_chain.apply(s, cplx.from_numpy(b))
            outs.append(cplx.to_numpy(y))
        np.testing.assert_allclose(got, np.concatenate(outs), atol=1e-5)
        client.close()

    def test_radio_retune_sends_command(self, server):
        srv, handler = server
        fs = 1e6
        chain = self._chain(fs, 100e3)
        runner = StreamRunner(chain, donate_state=False)
        client = SdrControlClient("127.0.0.1", srv.port)
        ctl = SdrReceiverControl(
            client, runner, center_hz=100e6, channel_hz=100.1e6
        )
        ctl.tune_radio(101e6, channel_hz=101.2e6)
        assert handler.calls == [("set_frequency", {"hz": 101e6})]
        assert ctl.offset_hz == pytest.approx(0.2e6)
        assert chain.get_block("shift").frequency == pytest.approx(-0.2e6)
        client.close()

    def test_missing_shift_stage_rejected(self, server):
        srv, _ = server
        chain = Chain([("fir", B.Fir(sps.firwin(9, 0.3).astype(np.float32), 1))])
        runner = StreamRunner(chain, donate_state=False)
        client = SdrControlClient("127.0.0.1", srv.port)
        with pytest.raises(ValueError, match="no shift stage"):
            SdrReceiverControl(client, runner, 1e6, 1.1e6)
        client.close()

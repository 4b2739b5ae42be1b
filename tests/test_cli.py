"""CLI app smoke tests (the reference's integration story is its apps,
nbfm_test.cpp:489-583; here they run headless with asserted outputs)."""

import wave

import numpy as np

from tpusdr.apps import receive


class TestReceiveCli:
    def test_wbfm_synth_to_wav(self, tmp_path):
        wav = tmp_path / "out.wav"
        rc = receive.main(
            [
                "--mod",
                "wbfm",
                "--input",
                "synth",
                "--rf-rate",
                "1e6",
                "--duration",
                "0.2",
                "--tick",
                "32768",
                "--audio",
                str(wav),
            ]
        )
        assert rc == 0
        with wave.open(str(wav)) as w:
            assert w.getframerate() == 48000
            assert w.getnframes() > 1000

    def test_dump_if_multi_sink(self, tmp_path):
        """--dump-if writes audio AND the pre-demod IF stream in one run
        (multi-sink fan-out, SteppingDriver.cpp:309-362 role)."""
        wav = tmp_path / "out.wav"
        iq = tmp_path / "if.iq"
        rc = receive.main(
            [
                "--mod",
                "wbfm",
                "--input",
                "synth",
                "--rf-rate",
                "1e6",
                "--duration",
                "0.2",
                "--tick",
                "32768",
                "--audio",
                str(wav),
                "--dump-if",
                str(iq),
            ]
        )
        assert rc == 0
        assert wav.exists()
        z = np.fromfile(iq, np.complex64)
        assert z.size > 0
        # IF rate = rf / rf_decimation; the dump must cover the whole run
        from tpusdr.models import receiver

        _, spec = receiver.fm_receiver(1e6, 0.0, receiver.WBFM, 48000.0)
        n_blocks_expected = z.size * spec.rf_decimation
        assert n_blocks_expected > 0.15 * 1e6  # ~0.2 s of RF made it through
        # the IF stream carries the FM carrier: nonzero, finite
        assert np.all(np.isfinite(z.view(np.float32)))
        assert np.abs(z).max() > 1e-3

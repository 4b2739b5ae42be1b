"""End-to-end receiver tests: synthetic RF in, audio out, SNR measured.

The reference's integration "tests" are apps a human listens to
(nbfm_test.cpp writing AAC files, SURVEY.md section 4); here the demodulated
audio is verified numerically: a clean FM/AM carrier must come back as a
clean tone with quantified SNR (the -60 dB design bound, BASELINE.md).
"""

import numpy as np
import pytest

from tpusdr.graph.runner import RunStats, StreamRunner
from tpusdr.io.sinks import CollectSink
from tpusdr.io.sources import SyntheticIqSource
from tpusdr.models import multichannel, receiver
from tpusdr.ops import cplx


def tone_snr(x: np.ndarray, f0: float, fs: float) -> tuple[float, float]:
    """Least-squares fit of a tone at f0; returns (amplitude, snr_db)."""
    t = np.arange(len(x)) / fs
    basis = np.stack([np.sin(2 * np.pi * f0 * t), np.cos(2 * np.pi * f0 * t)], axis=1)
    coef, *_ = np.linalg.lstsq(basis, x, rcond=None)
    fit = basis @ coef
    resid = x - fit - np.mean(x - fit)
    amp = float(np.hypot(*coef))
    snr = 10 * np.log10(np.mean(fit**2) / max(np.mean(resid**2), 1e-30))
    return amp, snr


class TestWbfmEndToEnd:
    def test_wbfm_tone_recovery(self):
        fs = 2.0e6
        audio_hz = 1000.0
        deviation = 75e3
        chain, spec = receiver.fm_receiver(
            fs,
            freq_offset=300e3,
            variant=receiver.WBFM,
            audio_rate=48000.0,
            deemphasis_tau=None,  # keep amplitude math simple
        )
        tick = chain.granule * max(1, 65536 // chain.granule)
        src = SyntheticIqSource.fm(
            tick, fs, audio_hz, deviation, carrier_offset=300e3, num_blocks=8
        )
        sink = CollectSink()
        runner = StreamRunner(chain)
        _, stats = runner.run(iter(src), sink)
        audio = sink.result()
        assert stats.samples_in == 8 * tick
        # Drop the filter transient, measure the tone.
        audio = audio[len(audio) // 4 :]
        amp, snr = tone_snr(audio, audio_hz, spec.audio_rate)
        expected_amp = deviation / spec.channel_width
        assert amp == pytest.approx(expected_amp, rel=0.05)
        assert snr > 40.0, f"WBFM audio SNR {snr:.1f} dB"

    def test_wbfm_int8_input(self):
        fs = 2.0e6
        chain, spec = receiver.fm_receiver(
            fs, variant=receiver.WBFM, input_format="int8", deemphasis_tau=None
        )
        tick = chain.granule * max(1, 65536 // chain.granule)
        src = SyntheticIqSource.fm(
            tick, fs, 800.0, 75e3, output_format="int8", num_blocks=6
        )
        sink = CollectSink()
        # int8 source yields 2*tick scalars per block = tick complex samples
        runner = StreamRunner(chain)
        _, _ = runner.run(iter(src), sink)
        audio = sink.result()
        audio = audio[len(audio) // 4 :]
        amp, snr = tone_snr(audio, 800.0, spec.audio_rate)
        # int8 quantization floor: still a clean tone
        assert snr > 35.0, f"int8 WBFM SNR {snr:.1f} dB"

    def test_nbfm_tone_recovery(self):
        fs = 240e3
        chain, spec = receiver.fm_receiver(
            fs,
            variant=receiver.NBFM,
            audio_rate=8000.0,
            deemphasis_tau=None,
        )
        tick = chain.granule * max(1, 30000 // chain.granule)
        src = SyntheticIqSource.fm(
            tick, fs, 440.0, receiver.NBFM_DEVIATION, num_blocks=8
        )
        sink = CollectSink()
        _, _ = StreamRunner(chain).run(iter(src), sink)
        audio = sink.result()
        audio = audio[len(audio) // 3 :]
        amp, snr = tone_snr(audio, 440.0, spec.audio_rate)
        assert snr > 40.0, f"NBFM audio SNR {snr:.1f} dB"


class TestAmEndToEnd:
    def test_am_tone_recovery(self):
        fs = 1.0e6
        audio_hz = 700.0
        mod_index = 0.5

        def make(t):
            carrier = 1.0 + mod_index * np.sin(2 * np.pi * audio_hz * t)
            return (0.5 * carrier).astype(np.complex64) * np.exp(
                2j * np.pi * 25e3 * t
            ).astype(np.complex64)

        chain, spec = receiver.am_receiver(fs, freq_offset=25e3, audio_rate=8000.0)
        tick = chain.granule * max(1, 50000 // chain.granule)
        src = SyntheticIqSource(tick, fs, make, num_blocks=8)
        sink = CollectSink()
        _, _ = StreamRunner(chain).run(iter(src), sink)
        audio = sink.result()
        audio = audio[len(audio) // 2 :]
        amp, snr = tone_snr(audio, audio_hz, spec.audio_rate)
        assert amp == pytest.approx(0.5 * mod_index, rel=0.1)
        assert snr > 35.0, f"AM audio SNR {snr:.1f} dB"


class TestChannelBank:
    def test_two_stations_demodulated_independently(self):
        fs = 1.024e6
        m = 8
        chain, info = multichannel.fm_channel_bank(
            fs, m, audio_rate=16000.0, deemphasis_tau=None
        )
        ch_rate = info["channel_rate"]
        k1, k2 = 2, 5
        f1, f2 = 900.0, 1300.0
        dev = min(75e3, ch_rate / 4)

        def make(t):
            def fm(fk, audio_f):
                audio = np.sin(2 * np.pi * audio_f * t)
                ph = 2 * np.pi * fk * t + 2 * np.pi * dev * np.cumsum(audio) / fs * 0
                # integrate audio properly:
                ph = 2 * np.pi * fk * t + 2 * np.pi * dev * np.cumsum(audio) / fs
                return np.exp(1j * ph)

            z = 0.5 * fm(k1 * fs / m, f1) + 0.5 * fm(k2 * fs / m, f2)
            return z.astype(np.complex64)

        tick = chain.granule * max(1, (1 << 17) // chain.granule)
        src = SyntheticIqSource(tick, fs, make, num_blocks=6)
        sink = CollectSink()

        runner = StreamRunner(chain)
        state = runner.init_state()
        outs = []
        for blk in iter(src):
            import jax

            state, y = runner._step(state, jax.device_put(blk))
            outs.append(np.asarray(cplx.to_numpy(y) if cplx.is_pair(y) else y))
        audio = np.concatenate(outs, axis=-1)  # (channels, n)
        assert audio.shape[0] == m
        half = audio.shape[-1] // 2
        a1, snr1 = tone_snr(audio[k1, half:], f1, info["audio_rate"])
        a2, snr2 = tone_snr(audio[k2, half:], f2, info["audio_rate"])
        assert snr1 > 30.0, f"channel {k1} SNR {snr1:.1f} dB"
        assert snr2 > 30.0, f"channel {k2} SNR {snr2:.1f} dB"
        # Each station decodes its own audio, not the other's (cross-talk):
        # the k2 channel must not contain the f1 tone at any level near a2.
        a_cross, _ = tone_snr(audio[k2, half:], f1, info["audio_rate"])
        assert a_cross < 0.1 * a2, f"cross-talk: {a_cross:.3f} vs {a2:.3f}"
        # (Complex-level adjacent-channel isolation is verified at -50 dB in
        # test_resample_channelizer; FM discriminators are amplitude-blind,
        # so audio-level leak checks on empty channels are meaningless.)

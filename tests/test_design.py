"""Tap-design tests: in-repo Remez/Kaiser vs scipy oracles.

Validates the replacement for the reference's external remez-exchange C
library (RfToPcmAudioFactory.cpp:87-110) at the -60 dB design attenuation the
reference apps use (nbfm_test.cpp:420-421).
"""

import numpy as np
import pytest
import scipy.signal as sps

from tpusdr.ops import design


def freq_response(taps, nfft=8192):
    w = np.fft.rfftfreq(nfft)
    h = np.abs(np.fft.rfft(taps, nfft))
    return w, h


def measure_lowpass(taps, f_pass, f_stop):
    w, h = freq_response(taps)
    pb = h[w <= f_pass]
    sb = h[w >= f_stop]
    ripple_db = 20 * np.log10(max(pb.max(), 1e-12) / max(pb.min(), 1e-12))
    atten_db = 20 * np.log10(max(sb.max(), 1e-12))
    return ripple_db, atten_db


class TestEstimators:
    def test_fred_harris(self):
        # -60 dB, 10% normalized transition -> 60/(22*0.1) ~= 28
        n = design.fred_harris_tap_count(-60.0, 0.1, 1.0)
        assert n == 28

    def test_bellanger_positive(self):
        n = design.bellanger_tap_count(1.0, 0.1, 0.01, -60.0)
        assert 20 < n < 60


class TestRemez:
    @pytest.mark.parametrize("num_taps", [31, 32, 63, 64, 101, 128])
    def test_lowpass_matches_scipy(self, num_taps):
        bands = np.array([[0.0, 0.2], [0.25, 0.5]])
        desired = np.array([1.0, 0.0])
        weights = np.array([1.0, 10.0])
        ours = design.remez(num_taps, bands, desired, weights)
        ref = sps.remez(
            num_taps, [0, 0.2, 0.25, 0.5], [1, 0], weight=[1, 10], fs=1.0
        )
        # Equiripple solutions are unique: taps should agree closely.
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=5e-4)

    def test_bandpass_matches_scipy(self):
        num_taps = 73
        bands = np.array([[0.0, 0.08], [0.12, 0.28], [0.32, 0.5]])
        desired = np.array([0.0, 1.0, 0.0])
        weights = np.array([5.0, 1.0, 5.0])
        ours = design.remez(num_taps, bands, desired, weights)
        ref = sps.remez(
            num_taps,
            [0, 0.08, 0.12, 0.28, 0.32, 0.5],
            [0, 1, 0],
            weight=[5, 1, 5],
            fs=1.0,
        )
        np.testing.assert_allclose(ours, ref, atol=1e-3)

    def test_linear_phase_symmetry(self):
        taps = design.remez(
            51, np.array([[0.0, 0.2], [0.26, 0.5]]), np.array([1.0, 0.0])
        )
        np.testing.assert_allclose(taps, taps[::-1], atol=1e-12)


class TestHighLevelDesign:
    def test_lowpass_meets_spec(self):
        # The nbfm_test RF filter ballpark: fs=19.968 MHz, ~200 kHz channel.
        fs = 19.968e6
        cutoff = 100e3
        transition = 50e3
        taps = design.lowpass_taps(fs, cutoff, transition, -60.0)
        assert taps.dtype == np.float32
        _, atten = measure_lowpass(
            taps.astype(np.float64), cutoff / fs, (cutoff + transition) / fs
        )
        assert atten < -55.0, f"stopband only {atten:.1f} dB"
        # Unity DC gain within 1%.
        assert abs(np.sum(taps) - 1.0) < 0.02

    def test_kaiser_fallback_meets_spec(self):
        taps = design.kaiser_lowpass(48e3, 8e3, 2e3, -60.0)
        _, atten = measure_lowpass(taps, 8e3 / 48e3, 10e3 / 48e3)
        assert atten < -55.0

    def test_bandpass_meets_spec(self):
        fs = 1.0
        taps = design.bandpass_taps(fs, 0.1, 0.2, 0.03, -60.0)
        w, h = freq_response(taps.astype(np.float64))
        sb = h[(w < 0.06) | (w > 0.24)]
        pb = h[(w > 0.11) & (w < 0.19)]
        assert 20 * np.log10(sb.max()) < -50.0
        assert abs(pb.max() - 1.0) < 0.05 and abs(pb.min() - 1.0) < 0.05


class TestMultistageDecimation:
    """decimation_stages must be spec-equivalent to the single-stage design:
    unity passband and >= -60 dB on every frequency that folds into the
    final band after all decimation stages."""

    @staticmethod
    def _composite_gain(stages, fs, freqs):
        """|H(f)| of the cascade at absolute input frequencies ``freqs``:
        each stage's DTFT is periodic in its own input rate."""
        g = np.ones_like(freqs, dtype=np.complex128)
        rate = fs
        for taps, d in stages:
            k = np.arange(len(taps))
            g = g * np.exp(-2j * np.pi * np.outer(freqs / rate, k)).dot(taps)
            rate /= d
        return np.abs(g)

    @pytest.mark.parametrize(
        "fs,cutoff,tw,D",
        [
            (20e6, 100e3, 100e3, 50),
            (2.4e6, 100e3, 100e3, 6),
            (10e6, 75e3, 25e3, 25),
            (100e6, 100e3, 100e3, 250),  # lane-aware model picks 2 stages
        ],
    )
    def test_spec_equivalence(self, fs, cutoff, tw, D):
        from tpusdr.ops import design

        stages = design.decimation_stages(fs, cutoff, tw, -60.0, D)
        assert int(np.prod([d for _, d in stages])) == D
        f_stop = cutoff + tw
        fs_out = fs / D

        # passband: ripple within ~0.2 dB (stacked stage ripples)
        fp = np.linspace(1.0, cutoff, 301)
        gp = self._composite_gain(stages, fs, fp)
        assert np.all(np.abs(gp - 1.0) < 0.025), (gp.min(), gp.max())

        # every input frequency whose post-decimation fold lands inside
        # [0, f_stop-eps] must be attenuated to <= -58 dB (allow 2 dB of
        # stacked transition-edge slack)
        f = np.linspace(0, fs / 2, 20001)
        folded = np.abs(((f + fs_out / 2) % fs_out) - fs_out / 2)
        mask = (folded <= cutoff) & (f > f_stop)
        ga = self._composite_gain(stages, fs, f[mask])
        assert ga.max() < 10 ** (-58.0 / 20.0), 20 * np.log10(ga.max())

    def test_multistage_streaming_matches_offline(self):
        """Cascaded streaming Firs == one-shot numpy cascade (block-split
        invariance through multiple stages)."""
        from tpusdr.graph import blocks as B
        from tpusdr.graph.chain import Chain
        from tpusdr.ops import design

        fs, D = 9.6e6, 24
        stages = design.decimation_stages(fs, 100e3, 100e3, -60.0, D)
        if len(stages) == 1:  # force a cascade: the streaming-composition
            # invariant must hold for any spec-equivalent split
            stages = [
                (design.lowpass_taps(fs, 100e3, fs / 4 - 2e5, -60.0), 4),
                (design.lowpass_taps(fs / 4, 100e3, 100e3, -60.0), 6),
            ]
        chain = Chain(
            [(f"fir{i}", B.Fir(t, d, "FloatComplex")) for i, (t, d) in enumerate(stages)]
        )
        rng = np.random.default_rng(7)
        n = chain.granule * (4096 // chain.granule + 1)
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

        from tpusdr.ops import cplx

        st = chain.init_state()
        cut = (n // 2 // chain.granule) * chain.granule
        st, y1 = chain.apply(st, cplx.from_numpy(x[:cut]))
        st, y2 = chain.apply(st, cplx.from_numpy(x[cut:]))
        got = np.concatenate([cplx.to_numpy(y1), cplx.to_numpy(y2)])

        # zero history prefill => streaming y[m] = full_conv[m*d]
        ref = x.astype(np.complex128)
        for taps, d in stages:
            full = np.convolve(ref, taps.astype(np.float64))
            ref = full[: len(ref) : d]
        m = min(len(got), len(ref))
        np.testing.assert_allclose(got[:m], ref[:m].astype(np.complex64), atol=2e-3)

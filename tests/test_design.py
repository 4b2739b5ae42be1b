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

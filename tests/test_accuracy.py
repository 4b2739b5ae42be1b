"""Accuracy budget: framework chain vs float64 NumPy oracle.

BASELINE.md target: <= -60 dB SNR error vs the reference pipeline.  We
cannot execute the CUDA reference here; the oracle is the same signal chain
computed in float64 NumPy (shift -> FIR -> discriminator), which is a
*stricter* standard (the reference itself is float32 CUDA).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpusdr.ops import cplx, demod, design, fir, osc
from tpusdr.ops import resample as rs


def err_db(got, ref):
    e = np.mean(np.abs(np.asarray(got, np.float64) - ref) ** 2)
    s = np.mean(np.abs(ref) ** 2)
    return 10 * np.log10(max(e, 1e-300) / s)


class TestChainAccuracy:
    def test_wbfm_front_end_vs_float64(self):
        fs, f_off, dev = 2.0e6, 300e3, 75e3
        d1 = 5
        taps32 = design.lowpass_taps(fs, 100e3, 100e3, -60.0)
        taps64 = taps32.astype(np.float64)

        n = 200000
        t = np.arange(n) / fs
        audio = np.sin(2 * np.pi * 1000 * t)
        ph = 2 * np.pi * f_off * t + 2 * np.pi * dev * np.cumsum(audio) / fs
        z64 = np.exp(1j * ph)
        z32 = z64.astype(np.complex64)

        # float64 oracle
        inc = osc.freq_to_inc_u32(-f_off, fs)
        cyc = (np.arange(n, dtype=np.float64) * (int(inc) / 2**32)) % 1.0
        lo64 = np.exp(2j * np.pi * cyc)
        u64 = z64 * lo64
        v64 = np.convolve(u64, taps64, mode="valid")[::d1]
        p64 = v64[1:] * np.conj(v64[:-1])
        y64 = np.arctan2(p64.imag, p64.real)

        # framework float32 path
        xp = cplx.from_numpy(z32)
        phase = osc.init_phase(0.0)
        lo = osc.complex_cosine_block(phase, inc, n)
        u = xp * lo
        v = fir.fir_extended(u, jnp.asarray(taps32), d1, "poly")
        vv = cplx.ensure_pair(v)
        prod = vv[..., 1:] * vv[..., :-1].conj()
        from tpusdr.ops import xmath

        y = np.asarray(xmath.atan2(prod.im, prod.re))

        n_cmp = min(len(y), len(y64))
        snr = err_db(y[:n_cmp], y64[:n_cmp])
        assert snr < -60.0, f"front-end error {snr:.1f} dB vs float64 oracle"

    def test_resampler_vs_float64(self):
        up, down = 24, 125
        taps = rs.design_resampler_taps(up, down)
        block = 125 * 200
        plan = rs.make_plan(taps, up, down, block)
        rng = np.random.default_rng(0)
        x64 = rng.standard_normal(block)
        import scipy.signal as sps

        ref = sps.upfirdn(taps.astype(np.float64), x64, up=up, down=down)[
            : plan.block_out
        ]
        s = rs.resample_init(plan, jnp.float32)
        _, y = rs.resample_apply(s, jnp.asarray(x64.astype(np.float32)), plan)
        snr = err_db(np.asarray(y), ref)
        assert snr < -60.0, f"resampler error {snr:.1f} dB"

    def test_oscillator_spectral_purity(self):
        """NCO spurious-free dynamic range: worst spur below -90 dBc."""
        fs, f = 1e6, 123456.7
        n = 1 << 16
        inc = osc.freq_to_inc_u32(f, fs)
        y = cplx.to_numpy(osc.complex_cosine_block(osc.init_phase(), inc, n))
        import scipy.signal as sps

        # 4-term Blackman-Harris (-92 dB sidelobes); exclude the carrier
        # skirt so we measure NCO spurs, not window leakage.
        win = sps.windows.blackmanharris(n)
        spec = np.abs(np.fft.fft(y * win))
        k0 = np.argmax(spec)
        spur = np.delete(spec, np.arange(k0 - 64, k0 + 65) % n)
        sfdr = 20 * np.log10(spur.max() / spec[k0])
        assert sfdr < -80.0, f"NCO SFDR {sfdr:.1f} dBc"

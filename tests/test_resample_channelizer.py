"""Rational resampler and PFB channelizer tests (scipy/naive oracles)."""

import numpy as np
import pytest
import scipy.signal as sps

import jax.numpy as jnp

from tpusdr.ops import channelizer as chan
from tpusdr.ops import cplx, design, fir
from tpusdr.ops import resample as rs


@pytest.fixture
def rng():
    return np.random.default_rng(11)


class TestResampler:
    @pytest.mark.parametrize("up,down", [(2, 1), (1, 3), (3, 2), (24, 125), (5, 4)])
    def test_matches_upfirdn(self, rng, up, down):
        taps = rs.design_resampler_taps(up, down)
        block = 1000 * down  # ensures block*up % down == 0
        plan = rs.make_plan(taps, up, down, block)
        x = rng.standard_normal(block).astype(np.float32)
        s = rs.resample_init(plan, jnp.float32)
        _, y = rs.resample_apply(s, jnp.asarray(x), plan)
        # Streaming from zero state == upfirdn on the raw signal:
        # y[m] = sum_i h[p_m + i*U] x[n_m - i] with x[<0] = 0.
        ref = sps.upfirdn(taps.astype(np.float64), x, up=plan.up, down=plan.down)
        np.testing.assert_allclose(
            np.asarray(y), ref[: plan.block_out], atol=2e-4
        )

    def test_streaming_invariance(self, rng):
        up, down = 3, 7
        taps = rs.design_resampler_taps(up, down)
        block = 70 * down
        plan = rs.make_plan(taps, up, down, block)
        x = rng.standard_normal(4 * block).astype(np.float32)
        s = rs.resample_init(plan, jnp.float32)
        outs = []
        for i in range(0, len(x), block):
            s, y = rs.resample_apply(s, jnp.asarray(x[i : i + block]), plan)
            outs.append(np.asarray(y))
        split = np.concatenate(outs)

        big_plan = rs.make_plan(taps, up, down, len(x))
        s0 = rs.resample_init(big_plan, jnp.float32)
        _, whole = rs.resample_apply(s0, jnp.asarray(x), big_plan)
        np.testing.assert_allclose(split, np.asarray(whole), atol=1e-5)

    def test_complex_pair(self, rng):
        up, down = 2, 3
        taps = rs.design_resampler_taps(up, down)
        block = 300
        plan = rs.make_plan(taps, up, down, block)
        z = (rng.standard_normal(block) + 1j * rng.standard_normal(block)).astype(
            np.complex64
        )
        s = rs.resample_init(plan, "pair")
        _, y = rs.resample_apply(s, cplx.from_numpy(z), plan)
        ref = sps.upfirdn(taps.astype(np.float64), z, up=up, down=down)
        np.testing.assert_allclose(cplx.to_numpy(y), ref[: plan.block_out], atol=2e-4)

    def test_tone_preserved(self, rng):
        """48 kHz tone resampled 250k->48k stays a clean tone (the rational
        audio-rate conversion the reference cannot do)."""
        fs_in, up, down = 250000.0, 24, 125
        taps = rs.design_resampler_taps(up, down)
        block = 125 * 400
        plan = rs.make_plan(taps, up, down, block)
        f0 = 1000.0
        t = np.arange(block) / fs_in
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        s = rs.resample_init(plan, jnp.float32)
        _, y = rs.resample_apply(s, jnp.asarray(x), plan)
        skip = 2 * plan.taps_per_phase  # past the filter transient
        y = np.asarray(y)[skip:]
        # Output sample m sits at input time m*D/U minus the prototype's
        # group delay (T-1)/(2U) input samples.
        delay = (plan.num_taps - 1) / (2 * plan.up)
        m = np.arange(skip, skip + len(y))
        t_out = (m * plan.down / plan.up - delay) / fs_in
        ref = np.sin(2 * np.pi * f0 * t_out)
        assert np.abs(y).max() == pytest.approx(1.0, abs=0.02)
        np.testing.assert_allclose(y, ref, atol=0.02)


class TestChannelizer:
    def test_channel_equals_downconvert_filter_decimate(self, rng):
        """Channel k of the PFB == shift-by-k*fs/M -> lowpass -> decimate M
        (the defining identity; validates taps/index/DFT conventions)."""
        m = 8
        taps = chan.design_prototype(m, taps_per_channel=8)
        block = m * 64
        plan = chan.make_plan(taps, m, block)
        z = (rng.standard_normal(block) + 1j * rng.standard_normal(block)).astype(
            np.complex64
        )
        s = chan.channelize_init(plan)
        _, y = chan.channelize_apply(s, cplx.from_numpy(z), plan)
        y = cplx.to_numpy(y)  # (F, M)

        padded = np.concatenate([np.zeros(plan.history, np.complex64), z])
        n_idx = np.arange(len(padded)) - plan.history
        for k in [0, 1, 3, m - 1]:
            shifted = padded * np.exp(-2j * np.pi * k * n_idx / m)
            filt = np.convolve(shifted, taps.astype(np.float64), mode="full")
            # y[f, k] corresponds to filtered output at input index f*m
            # relative to the padded stream: conv index f*m + history.
            want = filt[plan.history : plan.history + block : m]
            np.testing.assert_allclose(y[:, k], want, atol=1e-4)

    def test_tone_lands_in_right_channel(self, rng):
        m = 16
        taps = chan.design_prototype(m)
        block = m * 256
        plan = chan.make_plan(taps, m, block)
        fs = 1.0
        k0 = 5
        delta = 0.3 / m  # offset within the channel
        f0 = (k0 / m + delta) * fs
        n = np.arange(block)
        z = np.exp(2j * np.pi * f0 * n).astype(np.complex64)
        s = chan.channelize_init(plan)
        _, y = chan.channelize_apply(s, cplx.from_numpy(z), plan)
        y = cplx.to_numpy(y)[32:]  # drop filter transient
        powers = np.mean(np.abs(y) ** 2, axis=0)
        assert powers.argmax() == k0
        # Adjacent-channel rejection from the -60 dB prototype.
        others = np.delete(powers, k0)
        assert 10 * np.log10(others.max() / powers[k0]) < -50

    def test_streaming_invariance(self, rng):
        m = 4
        taps = chan.design_prototype(m, taps_per_channel=6)
        block = m * 32
        plan = chan.make_plan(taps, m, block)
        z = (
            rng.standard_normal(4 * block) + 1j * rng.standard_normal(4 * block)
        ).astype(np.complex64)
        s = chan.channelize_init(plan)
        outs = []
        for i in range(0, len(z), block):
            s, y = chan.channelize_apply(s, cplx.from_numpy(z[i : i + block]), plan)
            outs.append(cplx.to_numpy(y))
        split = np.concatenate(outs, axis=0)

        big = chan.make_plan(taps, m, len(z))
        _, whole = chan.channelize_apply(
            chan.channelize_init(big), cplx.from_numpy(z), big
        )
        np.testing.assert_allclose(split, cplx.to_numpy(whole), atol=1e-5)


class TestChannelMajorLayout:
    def test_channel_major_matches_row_major(self, rng):
        """channel_major=True (the production layout: branch FIR along
        lanes, flips folded into constants) == transpose of the row-major
        result, streaming state identical."""
        from tpusdr.ops import cplx

        for m in (8, 64):
            taps = chan.design_prototype(m, taps_per_channel=6)
            plan = chan.make_plan(taps, m, m * 32)
            z = (
                rng.standard_normal(m * 32) + 1j * rng.standard_normal(m * 32)
            ).astype(np.complex64)
            zp = cplx.from_numpy(z)
            s0 = chan.channelize_init(plan)
            s1, y_fm = chan.channelize_apply(s0, zp, plan)
            s2, y_cm = chan.channelize_apply(s0, zp, plan, channel_major=True)
            np.testing.assert_allclose(
                cplx.to_numpy(y_fm).T, cplx.to_numpy(y_cm), atol=1e-5
            )
            np.testing.assert_allclose(
                cplx.to_numpy(s1), cplx.to_numpy(s2), atol=0
            )
            # streaming: second block continues identically
            s1b, y2_fm = chan.channelize_apply(s1, zp, plan)
            s2b, y2_cm = chan.channelize_apply(s2, zp, plan, channel_major=True)
            np.testing.assert_allclose(
                cplx.to_numpy(y2_fm).T, cplx.to_numpy(y2_cm), atol=1e-5
            )

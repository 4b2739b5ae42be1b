"""Pallas kernel tests (interpret mode on CPU; compiled path exercised by
bench.py / the verify drive on the real chip).

Oracles: the XLA ops they fuse/replace.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpusdr.graph import blocks as B
from tpusdr.kernels.fir_pallas import fir_decim_pallas
from tpusdr.kernels.fm_pallas import fused_fm_demod_pallas
from tpusdr.models import receiver
from tpusdr.ops import cplx, demod, fir, mix, osc


@pytest.fixture
def rng():
    return np.random.default_rng(9)


class TestFirPallas:
    @pytest.mark.parametrize("T,D,M", [(546, 50, 1200), (64, 8, 700), (33, 4, 513)])
    def test_matches_poly(self, rng, T, D, M):
        taps = rng.standard_normal(T).astype(np.float32)
        L = T - 1 + M * D
        z = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(np.complex64)
        xp = cplx.from_numpy(z)
        ref = cplx.to_numpy(fir.fir_extended(xp, jnp.asarray(taps), D, "poly"))
        got = cplx.to_numpy(fir_decim_pallas(xp, taps, D, interpret=True))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)


class TestFusedFmPallas:
    def test_matches_unfused(self, rng):
        T, D, M = 91, 10, 800
        fs, f_off, gain = 2e6, 250e3, 0.8
        taps = rng.standard_normal(T).astype(np.float32) * 0.05
        inc = osc.freq_to_inc_u32(-f_off, fs)
        phase0 = osc.init_phase(1.1)
        L = (T - 1) + (M + 1) * D
        z = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(np.complex64)
        xp = cplx.from_numpy(z)

        lo = osc.complex_cosine_block(phase0, inc, L)
        v = cplx.to_numpy(fir.fir_extended(xp * lo, jnp.asarray(taps), D, "poly"))
        prod = v[1:] * np.conj(v[:-1])
        ref = gain * np.arctan2(prod.imag, prod.real)

        got = np.asarray(
            fused_fm_demod_pallas(xp, taps, D, inc, phase0, gain, interpret=True)
        )
        np.testing.assert_allclose(got, ref, atol=2e-4)


class TestFusedFmBlock:
    def test_streaming_matches_unfused_chain(self, rng):
        """FusedFmDemod block == FreqShift -> Fir -> QuadFmDemod chain,
        across multiple streaming ticks."""
        fs = 2e6
        chain_fused, spec = receiver.fm_receiver(
            fs, 300e3, receiver.WBFM, deemphasis_tau=None, use_fused=True
        )
        chain_ref, _ = receiver.fm_receiver(
            fs, 300e3, receiver.WBFM, deemphasis_tau=None, use_fused=False
        )
        from tpusdr.utils.numerics import lcm

        g = lcm(chain_ref.granule, chain_fused.granule)
        tick = g * max(1, 20000 // g)
        assert tick % chain_fused.granule == 0

        z = (
            rng.standard_normal(3 * tick) + 1j * rng.standard_normal(3 * tick)
        ).astype(np.complex64)
        zp = cplx.from_numpy(z)

        sf, sr_ = chain_fused.init_state(), chain_ref.init_state()
        for i in range(3):
            blk = zp[..., i * tick : (i + 1) * tick]
            sf, yf = chain_fused.apply(sf, blk)
            sr_, yr = chain_ref.apply(sr_, blk)
            np.testing.assert_allclose(
                np.asarray(yf), np.asarray(yr), atol=1e-3,
                err_msg=f"tick {i}",
            )

    def test_time_shardable(self, rng):
        """Fused frontend under time sharding matches unsharded."""
        from tests.test_parallel import assert_shard_stable
        from tpusdr.parallel.halo import TimeShardedStream
        from tpusdr.parallel.mesh import make_mesh

        fs = 1e6
        chain, _ = receiver.fm_receiver(
            fs, 125e3, receiver.WBFM, deemphasis_tau=None, use_fused=True
        )
        mesh = make_mesh(4)
        tss = TimeShardedStream(chain, mesh)
        tick = tss.tick_granule * max(
            1, (tss.halo + 4096) * 4 // tss.tick_granule
        )
        z = (rng.standard_normal(tick) + 1j * rng.standard_normal(tick)).astype(
            np.complex64
        )
        zp = cplx.from_numpy(z)
        _, ref = chain.apply(chain.init_state(), zp)
        carry = tss.init_carry()
        _, shd = tss.step(carry, zp)
        assert_shard_stable(np.asarray(shd), np.asarray(ref))


class TestBandedFirKernel:
    """kernels/fir_banded_pallas.py (interpret mode): bit-parity with the
    XLA mxu path for real and complex taps, plus the block wirings."""

    @pytest.mark.parametrize("T,D", [(546, 50), (33, 4), (46, 2)])
    def test_matches_xla_mxu(self, rng, T, D):
        import scipy.signal as sps

        from tpusdr.kernels.fir_banded_pallas import banded_fir_pallas, eligible
        from tpusdr.ops import fir as fir_ops

        assert eligible(T, D, True)
        M = 300
        L = (T - 1) + M * D
        z = (rng.standard_normal(L) + 1j * rng.standard_normal(L)).astype(
            np.complex64
        )
        zp = cplx.from_numpy(z)
        t = sps.firwin(T, 0.1).astype(np.float32)
        ref = fir_ops.fir_extended(zp, jnp.asarray(t), D, "mxu")
        got = banded_fir_pallas(zp, t, D, interpret=True)
        np.testing.assert_allclose(
            cplx.to_numpy(got), cplx.to_numpy(ref), atol=1e-6
        )
        tc = (t * np.exp(1j * 0.37 * np.arange(T))).astype(np.complex64)
        refc = fir_ops.fir_extended(
            zp, cplx.Complex(jnp.asarray(tc.real), jnp.asarray(tc.imag)), D, "mxu"
        )
        gotc = banded_fir_pallas(zp, tc, D, interpret=True)
        np.testing.assert_allclose(
            cplx.to_numpy(gotc), cplx.to_numpy(refc), atol=1e-6
        )

    def test_fir_block_banded_mode(self, rng):
        import scipy.signal as sps

        from tpusdr.graph import blocks as B

        t = sps.firwin(65, 0.1).astype(np.float32)
        n = 4096
        z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        zp = cplx.from_numpy(z)
        ref_b = B.Fir(t, 8)
        got_b = B.Fir(t, 8, mode="banded")
        s1, y1 = ref_b.apply(ref_b.init_state(), zp)
        s2, y2 = got_b.apply(got_b.init_state(), zp)
        np.testing.assert_allclose(
            cplx.to_numpy(y1), cplx.to_numpy(y2), atol=1e-6
        )
        # streaming continuation agrees too
        s1, y1 = ref_b.apply(s1, zp)
        s2, y2 = got_b.apply(s2, zp)
        np.testing.assert_allclose(
            cplx.to_numpy(y1), cplx.to_numpy(y2), atol=1e-6
        )

    def test_freqshiftfir_banded_mode(self, rng):
        import scipy.signal as sps

        from tpusdr.graph import blocks as B

        t = sps.firwin(89, 0.05).astype(np.float32)
        n = 8192
        z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        ref_b = B.FreqShiftFir(1e6, -150e3, t, 8)
        got_b = B.FreqShiftFir(1e6, -150e3, t, 8, mode="banded")
        s1, y1 = ref_b.apply(ref_b.init_state(), cplx.from_numpy(z))
        s2, y2 = got_b.apply(got_b.init_state(), cplx.from_numpy(z))
        np.testing.assert_allclose(np.asarray(y1.re), np.asarray(y2.re), atol=1e-5)
        np.testing.assert_allclose(np.asarray(y1.im), np.asarray(y2.im), atol=1e-5)

    def test_freqshiftfir_banded_under_scan(self, rng):
        """mode='banded' must trace under lax.scan (the chip probe crashed
        on a numpy conversion of traced modulated taps, r4)."""
        import jax
        import scipy.signal as sps
        from jax import lax

        from tpusdr.graph import blocks as B

        t = sps.firwin(89, 0.05).astype(np.float32)
        k, n = 3, 4096
        z = (rng.standard_normal((k, n)) + 1j * rng.standard_normal((k, n))).astype(
            np.complex64
        )
        xs = cplx.from_numpy(z)
        blk = B.FreqShiftFir(1e6, -150e3, t, 8, mode="banded")

        @jax.jit
        def run(state, xs):
            return lax.scan(blk.apply, state, xs)

        _, ys = run(blk.init_state(), xs)
        # eager per-tick application agrees
        st = blk.init_state()
        for i in range(k):
            st, y = blk.apply(st, xs[i])
            np.testing.assert_allclose(
                np.asarray(ys.re[i]), np.asarray(y.re), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(ys.im[i]), np.asarray(y.im), atol=1e-5
            )

    def test_fused_fm_banded_matches_xla(self, rng):
        """FusedFmDemod's banded path (interpret) == its XLA reference."""
        import os

        import scipy.signal as sps

        from tpusdr.graph import blocks as B

        t = sps.firwin(65, 0.1).astype(np.float32)
        n = 8192
        z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        blk = B.FusedFmDemod(1e6, -150e3, t, 8, gain=1.7)
        s1, y1 = blk.apply(blk.init_state(), cplx.from_numpy(z))  # interpret->banded
        os.environ["TPUSDR_PALLAS"] = "xla"
        try:
            s2, y2 = blk.apply(blk.init_state(), cplx.from_numpy(z))
        finally:
            del os.environ["TPUSDR_PALLAS"]
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4)


class TestPreludeKernel:
    """Zero-copy prelude form of the banded kernel (r5 roofline attack):
    the tick is read from its natural (N/G, G) reshape with 8 carried
    prelude rows — no prepend/pad copies.  Must match the XLA path
    across ticks, including the carried discriminator sample."""

    def test_prelude_matches_xla_streaming(self, rng):
        import os

        import scipy.signal as sps

        from tpusdr.graph import blocks as B

        t = sps.firwin(65, 0.1).astype(np.float32)
        blk = B.FusedFmDemod(1e6, -150e3, t, 8, gain=1.7)
        assert blk.granule == 8 * 1024  # 8 sublane rows of G = 128 * D
        n = 48 * 1024  # an 8G multiple: the prelude path engages
        z = (
            rng.standard_normal(3 * n) + 1j * rng.standard_normal(3 * n)
        ).astype(np.complex64)
        xs = cplx.from_numpy(z)

        def run():
            s = blk.init_state()
            outs = []
            for i in range(3):
                s, y = blk.apply(s, xs[i * n : (i + 1) * n])
                outs.append(np.asarray(y))
            return np.concatenate(outs)

        y_pre = run()  # interpret -> prelude kernel
        os.environ["TPUSDR_PALLAS"] = "xla"
        try:
            y_xla = run()
        finally:
            del os.environ["TPUSDR_PALLAS"]
        assert y_pre.shape == (3 * n // 8,)
        # atol: the discriminator's atan2 amplifies the FIR's ~3e-6
        # (split3-precision) relative error on stop-band-floor samples of
        # this white-noise input (6/18432 samples hit ~3e-4); real-signal
        # audio quality is held by the e2e SNR tests (test_accuracy, the
        # verify drive's >60 dB bar) at full carrier magnitudes.
        np.testing.assert_allclose(y_pre, y_xla, atol=2e-3)

    def test_prelude_raw_kernel_vs_mxu(self, rng):
        import scipy.signal as sps

        from tpusdr.kernels.fir_banded_pallas import (
            _GUARD,
            banded_fir_prelude,
            prelude_eligible,
            prelude_plan,
        )
        from tpusdr.ops import fir

        T, D = 89, 8
        G, _B = prelude_plan(T, D)
        N = 48 * G
        assert prelude_eligible(T, D, N, True)
        taps = sps.firwin(T, 0.05).astype(np.float32)
        sh = np.exp(-2j * np.pi * 0.15 * np.arange(T)).astype(np.complex64)
        ct = (taps * sh).astype(np.complex64)
        pre = cplx.Complex(
            rng.standard_normal((_GUARD, G)).astype(np.float32),
            rng.standard_normal((_GUARD, G)).astype(np.float32),
        )
        x = cplx.Complex(
            rng.standard_normal(N).astype(np.float32),
            rng.standard_normal(N).astype(np.float32),
        )
        y = banded_fir_prelude(x, pre, ct, D, interpret=True)
        flat = cplx.Complex(
            np.concatenate([np.asarray(pre.re).reshape(-1), np.asarray(x.re)]),
            np.concatenate([np.asarray(pre.im).reshape(-1), np.asarray(x.im)]),
        )
        p0 = _GUARD * G - (T - 1)
        ref = fir.fir_extended(flat[..., p0:], ct, D, mode="mxu")
        M = N // D
        np.testing.assert_allclose(
            np.asarray(y.re), np.asarray(ref.re)[:M], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(y.im), np.asarray(ref.im)[:M], atol=1e-5
        )


class TestPreludeEdges:
    def test_mixed_tick_sizes_keep_continuity(self, rng):
        """A prelude-path tick, then a non-8G tick (hist path), then a
        prelude tick again: the carried v_prev must stay right across
        the path switch (the hist path re-derives it from its extended
        window's extra output)."""
        import os

        import scipy.signal as sps

        from tpusdr.graph import blocks as B

        t = sps.firwin(65, 0.1).astype(np.float32)
        blk = B.FusedFmDemod(1e6, -150e3, t, 8, gain=1.7)
        n_pre = 48 * 1024  # 8G multiple -> prelude kernel
        n_odd = 48 * 1024 + 64  # not a G multiple -> hist path
        total = 2 * n_pre + n_odd
        z = (
            rng.standard_normal(total) + 1j * rng.standard_normal(total)
        ).astype(np.complex64)
        xs = cplx.from_numpy(z)
        cuts = [0, n_pre, n_pre + n_odd, total]

        def run():
            s = blk.init_state()
            outs = []
            for a, b in zip(cuts[:-1], cuts[1:]):
                s, y = blk.apply(s, xs[a:b])
                outs.append(np.asarray(y))
            return np.concatenate(outs)

        y_mixed = run()
        os.environ["TPUSDR_PALLAS"] = "xla"
        try:
            y_ref = run()
        finally:
            del os.environ["TPUSDR_PALLAS"]
        np.testing.assert_allclose(y_mixed, y_ref, atol=2e-3)

    def test_stagewise_sharding_with_fused_chain(self, rng):
        """Per-stage-rate halos over a chain whose front end is the
        prelude-kernel FusedFmDemod (granule 8G; cold halo warmup must
        honor the row-carry state shape)."""
        from tests.test_parallel import assert_shard_stable, run_unsharded
        from tpusdr.parallel.halo import TimeShardedStream
        from tpusdr.parallel.mesh import make_mesh

        fs = 1e6
        chain, _ = receiver.fm_receiver(
            fs, 125e3, receiver.WBFM, deemphasis_tau=None, use_fused=True
        )
        mesh = make_mesh(4)
        tss = TimeShardedStream(chain, mesh, stagewise=True)
        tick = tss.tick_granule * max(
            1, (tss.halo + 4096) * 4 // tss.tick_granule
        )
        z = (rng.standard_normal(2 * tick) + 1j * rng.standard_normal(2 * tick)).astype(
            np.complex64
        )
        zp = cplx.from_numpy(z)
        ref = run_unsharded(chain, zp, 2)
        carry = tss.init_carry()
        outs = []
        for i in range(2):
            carry, y = tss.step(carry, zp[..., i * tick : (i + 1) * tick])
            outs.append(np.asarray(y))
        assert_shard_stable(np.concatenate(outs), ref)

    def test_prelude_multi_backward_parts(self, rng):
        """Taps longer than one decimation row (T-1 > G -> B=3 backward
        parts): the generalized band split + part-start trimming must
        still match the XLA windows."""
        import scipy.signal as sps

        from tpusdr.kernels.fir_banded_pallas import (
            _GUARD,
            banded_fir_prelude,
            prelude_eligible,
            prelude_plan,
        )
        from tpusdr.ops import fir

        T, D = 2500, 8
        G, B = prelude_plan(T, D)
        assert B == 3
        N = 48 * G
        assert prelude_eligible(T, D, N, True)
        taps = sps.firwin(T, 0.01).astype(np.float32)
        ct = (taps * np.exp(-2j * np.pi * 0.11 * np.arange(T))).astype(
            np.complex64
        )
        pre = cplx.Complex(
            rng.standard_normal((_GUARD, G)).astype(np.float32),
            rng.standard_normal((_GUARD, G)).astype(np.float32),
        )
        x = cplx.Complex(
            rng.standard_normal(N).astype(np.float32),
            rng.standard_normal(N).astype(np.float32),
        )
        y = banded_fir_prelude(x, pre, ct, D, interpret=True)
        flat = cplx.Complex(
            np.concatenate([np.asarray(pre.re).reshape(-1), np.asarray(x.re)]),
            np.concatenate([np.asarray(pre.im).reshape(-1), np.asarray(x.im)]),
        )
        p0 = _GUARD * G - (T - 1)
        ref = fir.fir_extended(flat[..., p0:], ct, D, mode="mxu")
        M = N // D
        np.testing.assert_allclose(
            np.asarray(y.re), np.asarray(ref.re)[:M], atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(y.im), np.asarray(ref.im)[:M], atol=2e-5
        )

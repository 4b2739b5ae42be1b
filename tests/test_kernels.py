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
        tick = chain_ref.granule * max(1, 20000 // chain_ref.granule)
        tick = max(tick, chain_fused.granule)
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

"""Channel-sharded multi-channel bank tests (BASELINE.md config 4).

Verifies the two-collective design (halo ppermute -> channelize ->
all_to_all pivot -> local per-channel demod with resident state) against
the unsharded multichannel chain.
"""

import numpy as np
import pytest

from tests.test_parallel import assert_shard_stable
from tpusdr.graph import blocks as B
from tpusdr.graph.chain import Chain
from tpusdr.ops import cplx, demod
from tpusdr.parallel.channels import ChannelShardedBank
from tpusdr.parallel.mesh import make_mesh


@pytest.fixture
def rng():
    return np.random.default_rng(33)


def build(m=8, taps_per_channel=6, fs=1.0):
    chanb = B.Channelizer(m, taps_per_channel=taps_per_channel)
    gain = demod.quad_fm_demod_gain(fs / m, fs / m)
    demod_chain = Chain(
        [
            ("demod", B.QuadFmDemod(gain=gain)),
            ("deemph", B.Deemphasis(fs / m, 75e-6 * 1e6)),  # IIR, exact here
            ("audio", B.Resampler(1, 2)),
        ]
    )
    full = Chain([("chan", chanb)] + demod_chain.blocks)
    return chanb, demod_chain, full


class TestChannelShardedBank:
    def test_matches_unsharded(self, rng):
        mesh = make_mesh(4)
        chanb, demod_chain, full = build()
        bank = ChannelShardedBank(chanb, demod_chain, mesh)

        total = 8 * 128 * 4
        z = (rng.standard_normal(total) + 1j * rng.standard_normal(total)).astype(
            np.complex64
        )
        zp = cplx.from_numpy(z)

        # unsharded reference, 2 ticks
        s = full.init_state()
        refs = []
        for i in range(2):
            s, y = full.apply(s, zp[..., i * total // 2 : (i + 1) * total // 2])
            refs.append(np.asarray(y))
        ref = np.concatenate(refs, axis=-1)

        carry = bank.init_carry()
        outs = []
        for i in range(2):
            carry, y = bank.step(carry, zp[..., i * total // 2 : (i + 1) * total // 2])
            outs.append(np.asarray(y))
        shd = np.concatenate(outs, axis=-1)

        assert shd.shape == ref.shape == (8, total // 8 // 2)
        assert_shard_stable(shd, ref)

    def test_uneven_channels_are_padded(self):
        """6 channels over 4 devices: dead channels pad to 8, the output
        drops them (r1 rejected this shape; VERDICT next #8 relaxes it)."""
        mesh = make_mesh(4)
        chanb, demod_chain, _ = build(m=6)
        bank = ChannelShardedBank(chanb, demod_chain, mesh)
        assert bank.m_pad == 8 and bank.local_channels == 2

    def test_eight_way(self, rng):
        mesh = make_mesh(8)
        chanb, demod_chain, full = build(m=16)
        bank = ChannelShardedBank(chanb, demod_chain, mesh)
        total = 16 * 64 * 8
        z = (rng.standard_normal(total) + 1j * rng.standard_normal(total)).astype(
            np.complex64
        )
        zp = cplx.from_numpy(z)
        s = full.init_state()
        _, ref = full.apply(s, zp)
        carry = bank.init_carry()
        _, shd = bank.step(carry, zp)
        assert_shard_stable(np.asarray(shd), np.asarray(ref))

"""Checkpoint/resume of sharded stream carries (VERDICT r2 next #7).

The framework's pitch (SURVEY.md section 5) is that explicit carry pytrees
make checkpointing trivial; these tests prove it holds for the flagship
multi-chip modes: a TimeShardedStream and a ChannelShardedBank checkpointed
mid-stream resume bit-identically to a continuous run on the 8-device
virtual mesh.
"""

import numpy as np
import pytest
import scipy.signal as sps

from tests.test_channels_sharded import build as build_bank
from tests.test_parallel import assert_shard_stable
from tpusdr.graph import blocks as B
from tpusdr.graph.chain import Chain
from tpusdr.graph.checkpoint import load_state, save_state
from tpusdr.ops import cplx
from tpusdr.parallel.channels import ChannelShardedBank
from tpusdr.parallel.halo import TimeShardedStream
from tpusdr.parallel.mesh import make_mesh


@pytest.fixture
def rng():
    return np.random.default_rng(55)


def _ticks(rng, total, ticks):
    z = (rng.standard_normal(total) + 1j * rng.standard_normal(total)).astype(
        np.complex64
    )
    zp = cplx.from_numpy(z)
    n = total // ticks
    return [zp[..., i * n : (i + 1) * n] for i in range(ticks)]


def _wbfm_chain():
    return Chain(
        [
            ("shift", B.FreqShift(1e6, -123e3)),
            ("fir", B.Fir(sps.firwin(33, 0.3).astype(np.float32), 4)),
            ("demod", B.QuadFmDemod(gain=1.3)),
            ("deemph", B.Deemphasis(250e3, 75e-6)),  # IIR -> tail_state
        ]
    )


class TestTimeShardedCheckpoint:
    def test_resume_equals_continuous(self, rng, tmp_path):
        mesh = make_mesh(8)
        chain = _wbfm_chain()
        tss = TimeShardedStream(chain, mesh)
        # per-shard length must clear the IIR warm-up halo (~1.2k samples)
        blocks = _ticks(rng, 8 * 2048 * 4, 4)

        # continuous 4-tick run
        carry = tss.init_carry()
        ref = []
        for b in blocks:
            carry, y = tss.step(carry, b)
            ref.append(np.asarray(y))

        # 2 ticks -> checkpoint -> resume (fresh object) -> 2 ticks
        tss1 = TimeShardedStream(chain, mesh)
        carry = tss1.init_carry()
        for b in blocks[:2]:
            carry, _ = tss1.step(carry, b)
        path = str(tmp_path / "tss.npz")
        save_state(path, carry)

        tss2 = TimeShardedStream(_wbfm_chain(), mesh)
        carry2 = load_state(path, tss2.init_carry())
        got = []
        for b in blocks[2:]:
            carry2, y = tss2.step(carry2, b)
            got.append(np.asarray(y))

        for g, r in zip(got, ref[2:]):
            assert_shard_stable(g, r)

    def test_structure_mismatch_rejected(self, rng, tmp_path):
        mesh = make_mesh(4)
        tss = TimeShardedStream(_wbfm_chain(), mesh)
        path = str(tmp_path / "tss.npz")
        save_state(path, tss.init_carry())
        other = TimeShardedStream(
            Chain([("fir", B.Fir(sps.firwin(9, 0.4).astype(np.float32), 1))]),
            mesh,
        )
        with pytest.raises(ValueError, match="mismatch|shape"):
            load_state(path, other.init_carry())


class TestChannelShardedCheckpoint:
    def test_resume_equals_continuous(self, rng, tmp_path):
        mesh = make_mesh(4)
        chanb, demod_chain, _ = build_bank()
        bank = ChannelShardedBank(chanb, demod_chain, mesh)
        blocks = _ticks(rng, 8 * 128 * 8, 4)

        carry = bank.init_carry()
        ref = []
        for b in blocks:
            carry, y = bank.step(carry, b)
            ref.append(np.asarray(y))

        chanb1, demod1, _ = build_bank()
        bank1 = ChannelShardedBank(chanb1, demod1, mesh)
        carry = bank1.init_carry()
        for b in blocks[:2]:
            carry, _ = bank1.step(carry, b)
        path = str(tmp_path / "bank.npz")
        save_state(path, carry)

        chanb2, demod2, _ = build_bank()
        bank2 = ChannelShardedBank(chanb2, demod2, mesh)
        carry2 = load_state(path, bank2.init_carry())
        got = []
        for b in blocks[2:]:
            carry2, y = bank2.step(carry2, b)
            got.append(np.asarray(y))

        for g, r in zip(got, ref[2:]):
            assert_shard_stable(g, r)

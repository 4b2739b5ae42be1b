"""Sharded-ingest tests (single-process path over the virtual 8-dev mesh;
the same code serves multi-host pods via process-local shards)."""

import numpy as np
import pytest

import jax

from tpusdr.graph import blocks as B
from tpusdr.graph.chain import Chain
from tpusdr.ops import cplx
from tpusdr.parallel.halo import TimeShardedStream
from tpusdr.parallel.ingest import ShardedFileIngest
from tpusdr.parallel.mesh import make_mesh


class TestShardedFileIngest:
    def test_ticks_match_file(self, tmp_path):
        path = str(tmp_path / "cap.cf32")
        rng = np.random.default_rng(0)
        z = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
            np.complex64
        )
        z.tofile(path)
        mesh = make_mesh(8)
        ing = ShardedFileIngest(path, mesh, tick_samples=2048)
        assert ing.num_ticks == 2
        ticks = list(ing.ticks())
        got = np.concatenate([cplx.to_numpy(t) for t in ticks])
        np.testing.assert_allclose(got, z, atol=1e-7)
        # the arrays really are sharded over the mesh
        assert len(ticks[0].re.sharding.device_set) == 8

    def test_int8_ingest_feeds_sharded_chain(self, tmp_path):
        path = str(tmp_path / "cap.iq")
        rng = np.random.default_rng(1)
        raw = rng.integers(-128, 128, size=2 * 8192, dtype=np.int8)
        raw.tofile(path)
        mesh = make_mesh(4)

        import scipy.signal as sps

        chain = Chain([("fir", B.Fir(sps.firwin(17, 0.3).astype(np.float32), 2))])
        tss = TimeShardedStream(chain, mesh)
        tick = 4096
        ing = ShardedFileIngest(path, mesh, tick, input_format="int8")
        carry = tss.init_carry()
        outs = []
        for x in ing.ticks():
            carry, y = tss.step(carry, x)
            outs.append(cplx.to_numpy(y))
        got = np.concatenate(outs)

        # unsharded oracle
        f = raw.astype(np.float32) / 128.0
        z = (f[0::2] + 1j * f[1::2]).astype(np.complex64)
        s = chain.init_state()
        ref = []
        for i in range(0, len(z), tick):
            s, y = chain.apply(s, cplx.from_numpy(z[i : i + tick]))
            ref.append(cplx.to_numpy(y))
        ref = np.concatenate(ref)
        err = np.mean(np.abs(got - ref) ** 2) / np.mean(np.abs(ref) ** 2)
        assert err < 1e-10

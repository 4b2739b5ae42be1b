"""Multi-output Graph and fan-out tests.

The reference supports fan-out via per-port output copiers
(SteppingDriver.cpp:309-358, BaseSource copier vector); here a node value is
an immutable array, so fan-out is free — multiple consumers and multiple
graph outputs read the same value.
"""

import numpy as np
import pytest
import scipy.signal as sps

from tpusdr.graph import blocks as B
from tpusdr.graph.graph import Graph
from tpusdr.ops import cplx


@pytest.fixture
def rng():
    return np.random.default_rng(77)


class TestFanOut:
    def test_one_source_two_consumers_two_outputs(self, rng):
        taps = sps.firwin(17, 0.3).astype(np.float32)
        g = Graph(
            nodes={
                "fir": B.Fir(taps, 2),
                "fm": B.QuadFmDemod(gain=1.0),
                "mag": B.Magnitude(),
            },
            connections=[("fir", 0, "fm", 0), ("fir", 0, "mag", 0)],
            input_map=[(0, "fir", 0)],
            output=["fm", "mag"],
        )
        z = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(
            np.complex64
        )
        s = g.init_state()
        s, (y_fm, y_mag) = g.apply(s, cplx.from_numpy(z))
        assert np.asarray(y_fm).shape == (256,)
        assert np.asarray(y_mag).shape == (256,)
        # mag consumer sees the same FIR output the demod does
        _, direct = B.Fir(taps, 2).apply(
            B.Fir(taps, 2).init_state(), cplx.from_numpy(z)
        )
        np.testing.assert_allclose(
            np.asarray(y_mag), np.abs(cplx.to_numpy(direct)), atol=1e-5
        )

    def test_streaming_multi_output(self, rng):
        taps = sps.firwin(9, 0.4).astype(np.float32)
        g = Graph(
            nodes={"fir": B.Fir(taps, 1), "fm": B.QuadFmDemod(gain=2.0),
                   "mag": B.Magnitude()},
            connections=[("fir", 0, "fm", 0), ("fir", 0, "mag", 0)],
            input_map=[(0, "fir", 0)],
            output=["fm", "mag"],
        )
        z = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(
            np.complex64
        )
        zp = cplx.from_numpy(z)
        s = g.init_state()
        parts_fm, parts_mag = [], []
        for i in range(0, 1024, 256):
            s, (a, b) = g.apply(s, zp[..., i : i + 256])
            parts_fm.append(np.asarray(a))
            parts_mag.append(np.asarray(b))
        s0 = g.init_state()
        _, (wa, wb) = g.apply(s0, zp)
        # 1e-5: MXU FIR tile-phase reassociation (see test_graph_chain note).
        np.testing.assert_allclose(np.concatenate(parts_fm), np.asarray(wa), atol=1e-5)
        np.testing.assert_allclose(np.concatenate(parts_mag), np.asarray(wb), atol=1e-5)

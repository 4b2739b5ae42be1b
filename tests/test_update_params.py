"""Runtime parameter updates (Node::updateParameters parity, Filter.h:36).

The reference exposes a JSON reconfigure hook on every node; here
update_parameters must (a) recompute derived attributes (NCO increments,
IIR coefficients, tap arrays), (b) flow through composites
(Chain/Graph.update_block_parameters), and (c) take effect through a
re-jitted step (StreamRunner.refresh), since jit caches on the function
object, not on closed-over block attributes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpusdr.graph import blocks as B
from tpusdr.graph.chain import Chain
from tpusdr.graph.runner import StreamRunner
from tpusdr.ops import osc


def _tone(freq, fs, n, phase=0.0):
    t = np.arange(n) / fs
    return np.exp(2j * np.pi * freq * t + 1j * phase).astype(np.complex64)


class TestBlockUpdates:
    def test_freq_shift_recomputes_inc(self):
        blk = B.FreqShift(1e6, 100e3)
        old_inc = blk.inc
        blk.update_parameters(frequency=-250e3)
        assert blk.frequency == -250e3
        assert blk.inc != old_inc
        assert blk.inc == osc.freq_to_inc_u32(-250e3, 1e6)

    def test_cosine_source_recomputes_inc(self):
        blk = B.CosineSource(1e6, 100e3)
        blk.update_parameters(frequency=50e3)
        assert blk.inc == osc.freq_to_inc_u32(50e3, 1e6)
        # new frequency actually generated
        st = blk.init_state()
        _, y = blk.generate(st, 4096)
        ref = _tone(50e3, 1e6, 4096)
        np.testing.assert_allclose(np.asarray(y.re), ref.real, atol=1e-4)

    def test_fir_set_taps(self):
        t1 = np.ones(9, np.float32) / 9
        blk = B.Fir(t1, 1, "Float")
        t2 = np.ones(17, np.float32) / 17
        blk.update_parameters(taps=t2)
        assert blk.history == 16
        assert blk.taps.shape == (17,)
        assert blk.taps.dtype == jnp.float32
        # state re-init required after a tap-count change
        st = blk.init_state()
        assert st.shape[-1] == 16

    def test_deemphasis_recomputes_coeffs(self):
        blk = B.Deemphasis(48e3, 75e-6)
        a_old = blk.a
        blk.update_parameters(tau=50e-6)
        assert blk.a != a_old
        # faster decay -> shorter warmup history
        assert blk.history < int(np.ceil(np.log(1e-7) / np.log(a_old))) + 1

    def test_unknown_parameter_raises(self):
        blk = B.AddConst(1.0)
        with pytest.raises(AttributeError):
            blk.update_parameters(no_such_param=3)

    def test_quad_fm_gain_update(self):
        blk = B.QuadFmDemod(gain=1.0)
        blk.update_parameters(gain=2.0)
        st = blk.init_state()
        x = np.exp(1j * np.cumsum(0.1 * np.ones(64))).astype(np.complex64)
        _, y1 = blk.apply(st, x)
        blk.update_parameters(gain=4.0)
        _, y2 = blk.apply(st, x)
        np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), rtol=1e-5)


class TestCompositeUpdates:
    def test_chain_update_and_replan(self):
        fir1 = B.Fir(np.ones(9, np.float32) / 9, 2, "FloatComplex")
        chain = Chain([("shift", B.FreqShift(1e6, 100e3)), ("fir", fir1)])
        h0 = chain.history
        chain.update_block_parameters("fir", taps=np.ones(33, np.float32) / 33)
        assert chain.get_block("fir").history == 32
        assert chain.history > h0  # aggregate replanned

    def test_chain_rejects_rate_change(self):
        chain = Chain([("r", B.Resampler(1, 2))])
        with pytest.raises(ValueError, match="rate"):
            chain.update_block_parameters("r", up=2)

    def test_chain_unknown_block(self):
        chain = Chain([("a", B.AddConst(0.0))])
        with pytest.raises(KeyError):
            chain.update_block_parameters("nope", add_value=1.0)

    def test_graph_update(self):
        from tpusdr.graph.graph import build_graph

        g = build_graph(
            {
                "nodes": {"add": {"type": "AddConst", "add_value": 1.0}},
                "connections": [],
                "inputPorts": [
                    {"exposedPort": 0, "mapped": {"node": "add", "port": 0}}
                ],
                "outputPort": {"node": "add", "port": 0},
            }
        )
        g.update_block_parameters("add", add_value=5.0)
        assert g.get_block("add").add_value == 5.0


class TestRunnerRefresh:
    def test_retune_via_runner(self):
        """A frequency retune must change the demodulated output only after
        refresh() — proving both the staleness hazard and its fix."""
        fs = 1e6
        chain = Chain([("shift", B.FreqShift(fs, -100e3))])
        runner = StreamRunner(chain, donate_state=False)
        n = 4096
        x = _tone(100e3, fs, n)

        state = runner.init_state()
        _, y1 = runner._step(state, jax.device_put(_pair(x)))
        # shifting the +100k tone by -100k lands at DC: constant phasor
        re1 = np.asarray(y1.re)
        assert np.std(re1[100:]) < 1e-3

        # stale jit: update without refresh keeps old compiled constant
        runner.block.update_block_parameters("shift", frequency=-200e3)
        _, y_stale = runner._step(state, jax.device_put(_pair(x)))
        np.testing.assert_allclose(
            np.asarray(y_stale.re), re1, atol=1e-6
        )

        runner.refresh()
        _, y2 = runner._step(state, jax.device_put(_pair(x)))
        # now the tone sits at -100 kHz: oscillating real part
        assert np.std(np.asarray(y2.re)[100:]) > 0.5

    def test_update_parameters_one_call(self):
        chain = Chain([("add", B.AddConst(1.0))])
        runner = StreamRunner(chain, donate_state=False)
        x = jnp.zeros(256, jnp.float32)
        st = runner.init_state()
        _, y = runner._step(st, x)
        assert float(y[0]) == 1.0
        runner.update_parameters("add", add_value=3.0)
        _, y = runner._step(st, x)
        assert float(y[0]) == 3.0


def _pair(z):
    from tpusdr.ops import cplx

    return cplx.from_numpy(z)


class TestJsonUpdates:
    """updateParameters(json) parity (VERDICT r3 next #10): a
    build_graph-built pipeline retuned from a JSON string with the
    reference's camelCase keys."""

    def _graph(self):
        from tpusdr.graph.graph import build_graph

        return build_graph(
            {
                "nodes": {
                    "shift": {
                        "type": "FreqShift",
                        "sampleRate": 1e6,
                        "frequency": -100e3,
                    },
                    "add": {"type": "AddConst", "addValue": 1.0},
                },
                "connections": [
                    {"source": "shift", "sink": "add"},
                ],
                "inputPorts": [
                    {"exposedPort": 0, "mapped": {"node": "shift", "port": 0}}
                ],
                "outputPort": {"node": "add", "port": 0},
            }
        )

    def test_block_json_string(self):
        blk = B.FreqShift(1e6, 100e3)
        blk.update_parameters_json('{"frequency": -250e3}')
        assert blk.frequency == -250e3
        assert blk.inc == osc.freq_to_inc_u32(-250e3, 1e6)

    def test_graph_json_camel_case(self):
        g = self._graph()
        g.update_block_parameters_json("add", '{"addValue": 7.5}')
        assert g.get_block("add").add_value == 7.5

    def test_runner_json_retune_end_to_end(self):
        """Retune the shift NCO of a JSON-built graph from a JSON string
        through the runner; the new frequency must take effect (re-jit)."""
        g = self._graph()
        runner = StreamRunner(g, donate_state=False)
        fs, n = 1e6, 4096
        x = _pair(_tone(100e3, fs, n))
        st = runner.init_state()
        _, y1 = runner._step(st, jax.device_put(x))
        assert np.std(np.asarray(y1.re)[100:]) < 1e-3  # tone at DC (+1 const)
        runner.update_parameters_json("shift", '{"frequency": -200e3}')
        _, y2 = runner._step(st, jax.device_put(x))
        assert np.std(np.asarray(y2.re)[100:]) > 0.5  # tone moved off DC

    def test_chain_json_dict(self):
        chain = Chain([("add", B.AddConst(1.0))])
        chain.update_block_parameters_json("add", {"addValue": 2.0})
        assert chain.get_block("add").add_value == 2.0


class TestFusedFmDemodUpdate:
    def test_taps_update_recomputes_plan(self):
        """updateParameters(taps=...) on the fused front end must
        recompute history/granule/row-capability (Fir setTaps parity,
        Fir.cpp:124) so the next init_state carries the right shape."""
        import numpy as np
        import scipy.signal as sps

        from tpusdr.graph import blocks as B
        from tpusdr.ops import cplx

        rng = np.random.default_rng(3)
        blk = B.FusedFmDemod(1e6, -150e3, sps.firwin(65, 0.1), 8, gain=1.0)
        g0, h0 = blk.granule, blk.history
        blk.update_parameters(taps=sps.firwin(129, 0.1))
        assert blk.history == 128 + 8 and blk.history != h0
        assert blk.granule == g0  # same D -> same row geometry
        n = blk.granule * 48
        z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        s = blk.init_state()  # sized for the NEW taps
        s, y = blk.apply(s, cplx.from_numpy(z))
        assert y.shape == (n // 8,)

    def test_decimation_update_trips_chain_rate_guard(self):
        """A decimation change is a rate change: the Chain guard must see
        it (down derives from decimation in _params_updated) and refuse."""
        import numpy as np
        import pytest
        import scipy.signal as sps

        from tpusdr.graph import blocks as B
        from tpusdr.graph.chain import Chain

        chain = Chain([("fir", B.Fir(sps.firwin(33, 0.2), 4))])
        with pytest.raises(ValueError, match="rate"):
            chain.update_block_parameters("fir", decimation=8)

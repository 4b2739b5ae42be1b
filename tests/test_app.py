"""App-compiler tests: full-pipeline JSON specs with IO endpoint nodes,
the shape of the reference applications (nbfm_test.cpp:434-484) as data.
"""

import json
import wave

import numpy as np
import pytest

from tpusdr.graph.app import compile_app
from tpusdr.ops import design


def wbfm_spec(tmp_path, fs=1.0e6, offset=150e3):
    d1 = int(fs // (2 * 200e3))
    quad = fs / d1
    taps = design.lowpass_taps(fs, 100e3, 100e3, -60.0)
    return {
        "nodes": {
            "src": {
                "type": "Synth",
                "kind": "fm",
                "sampleRate": fs,
                "carrierOffset": offset,
                "audioHz": 1000.0,
                "deviation": 75e3,
                "numBlocks": 4,
            },
            "shift": {"type": "FreqShift", "sampleRate": fs, "frequency": -offset},
            "rf": {
                "type": "Fir",
                "taps": [float(t) for t in taps],
                "decimation": d1,
            },
            "demod": {
                "type": "QuadDemod",
                "modulation": "Fm",
                "sampleRate": quad,
                "fskDeviation": 200e3 / 2 / 3.14159,  # ~ gain parity
            },
            "out": {"type": "WavWriter", "path": str(tmp_path / "out.wav"),
                     "sampleRate": quad},
        },
        "connections": [
            {"source": "src", "sink": "shift"},
            {"source": "shift", "sink": "rf"},
            {"source": "rf", "sink": "demod"},
            {"source": "demod", "sink": "out"},
        ],
    }


class TestCompileApp:
    def test_end_to_end_wav(self, tmp_path):
        spec = wbfm_spec(tmp_path)
        app = compile_app(spec, tick=1 << 16)
        stats = app.run()
        assert stats.blocks == 4
        assert stats.samples_out > 0
        with wave.open(str(tmp_path / "out.wav")) as w:
            assert w.getnframes() == stats.samples_out
            pcm = np.frombuffer(w.readframes(w.getnframes()), "<i2")
        # demodulated FM of a tone: substantial audio energy
        assert np.abs(pcm[len(pcm) // 2 :]).max() > 1000

    def test_json_string_accepted(self, tmp_path):
        spec = wbfm_spec(tmp_path)
        spec["nodes"]["out"] = {"type": "NullSink"}
        app = compile_app(json.dumps(spec), tick=1 << 16)
        stats = app.run(max_blocks=2)
        assert stats.samples_out > 0

    def test_requires_single_source_sink(self, tmp_path):
        spec = wbfm_spec(tmp_path)
        del spec["nodes"]["src"]
        spec["connections"] = [c for c in spec["connections"] if c["source"] != "src"]
        with pytest.raises(ValueError, match="1 source"):
            compile_app(spec)

    def test_aacwriter_alias_writes_wav(self, tmp_path):
        spec = wbfm_spec(tmp_path)
        spec["nodes"]["out"]["type"] = "AacWriter"
        app = compile_app(spec, tick=1 << 16)
        stats = app.run(max_blocks=1)
        assert (tmp_path / "out.wav").exists()

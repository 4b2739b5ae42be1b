"""Quick perf gate: measure the two headline hot paths on the real TPU.

Smaller/faster than bench.py (one compile per metric, short scans) so the
perf regression test (tests/test_perf.py) finishes in ~2 minutes.  Prints
one JSON line: {"fir_mxu_msps_perfgate": ..., "wbfm_chain_msps_perfgate": ...}.

Run:  TPUSDR_PERF=1 python -m pytest tests/test_perf.py -m perf
 or:  python benchmarks/perf_gate.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    from jax import lax

    from tpusdr.models import receiver
    from tpusdr.ops import cplx, fir
    from tpusdr.utils.profiling import scan_marginal, tile_ticks

    tick = 1 << 21
    ks = (4, 24, 48)
    rng = np.random.default_rng(0)
    # few unique host ticks tiled on device: a direct 768 MB device_put
    # through this box's tunnel costs minutes (CLAUDE.md)
    xs = tile_ticks(
        cplx.Complex(
            rng.standard_normal((8, tick)).astype(np.float32),
            rng.standard_normal((8, tick)).astype(np.float32),
        ),
        max(ks),
    )
    out = {}

    # 1) the WBFM RF FIR alone (T=546, D=50) on the banded-matmul path
    taps = np.hanning(546).astype(np.float32)
    taps /= taps.sum()
    tick_d = (tick // 50) * 50
    xs_d = cplx.Complex(xs.re[:, :tick_d], xs.im[:, :tick_d])

    def fir_step(state, x):
        return fir.fir_apply(state, x, taps, 50, "mxu")

    @jax.jit
    def fir_run(state, xs):
        return lax.scan(fir_step, state, xs)

    m = scan_marginal(fir_run, fir.fir_init_state(taps, "pair"), xs_d, ks=ks, reps=4)
    out["fir_mxu_msps_perfgate"] = round(tick_d / m["per_tick"] / 1e6, 1)

    # 2) the full WBFM receiver chain (bench.py headline, shorter scans)
    chain, _ = receiver.fm_receiver(20e6, 2.5e6, receiver.WBFM, 48000.0)
    tick_c = chain.granule * max(1, tick // chain.granule)
    xs_c = cplx.Complex(xs.re[:, :tick_c], xs.im[:, :tick_c])

    @jax.jit
    def chain_run(state, xs):
        return lax.scan(chain.apply, state, xs)

    m = scan_marginal(
        chain_run, jax.device_put(chain.init_state()), xs_c, ks=ks, reps=4
    )
    out["wbfm_chain_msps_perfgate"] = round(tick_c / m["per_tick"] / 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

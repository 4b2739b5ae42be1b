"""Probe: banded MXU Pallas kernel (VMEM windows) vs the XLA mxu path.

VERDICT r2 weak #5: the XLA banded path writes + re-reads the window
matrix in HBM; kernels/fir_banded_pallas.py assembles it in VMEM.  This
measures both on the WBFM RF front end (FreqShiftFir T=546 D=50, complex
folded taps) and on the full WBFM chain, on the real chip.

Run: nohup timeout 1750 python benchmarks/banded_kernel_probe.py > /tmp/banded.log 2>&1 &
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

    from tpusdr.graph import blocks as B
    from tpusdr.models import receiver
    from tpusdr.ops import cplx
    from tpusdr.utils.profiling import scan_marginal

    from tpusdr.utils.profiling import tile_ticks

    fs = 20e6
    tick = 1 << 21
    ks = (8, 64, 128)
    rng = np.random.default_rng(0)
    # few unique host ticks, tiled on device (full stack would be a 2 GB
    # host upload = minutes through the tunnel, CLAUDE.md)
    xs = tile_ticks(
        cplx.Complex(
            rng.standard_normal((8, tick)).astype(np.float32),
            rng.standard_normal((8, tick)).astype(np.float32),
        ),
        max(ks),
    )

    import scipy.signal as sps

    taps = sps.firwin(546, 2 * 100e3 / fs).astype(np.float32)

    for mode in ("auto", "banded"):
        blk = B.FreqShiftFir(fs, -2.5e6, taps, 50, mode=mode)

        @jax.jit
        def run(state, xs, blk=blk):
            return lax.scan(blk.apply, state, xs)

        m = scan_marginal(run, blk.init_state(), xs, ks=ks, reps=5)
        print(
            json.dumps(
                {
                    "metric": f"shiftfir_546_50_{mode}_msps",
                    "value": round(tick / m["per_tick"] / 1e6, 1),
                    "spread_pct": round(100 * m["spread"], 1),
                }
            ),
            flush=True,
        )

    for mode in ("auto", "banded"):
        # use_fused=False: this compares FIR modes INSIDE the unfused
        # chain; the fused-vs-unfused chain comparison is bench_configs
        # configs 3 vs 5.
        chain, _ = receiver.fm_receiver(
            fs, 2.5e6, receiver.WBFM, 48000.0, fir_mode=mode, use_fused=False
        )
        t2 = chain.granule * max(1, tick // chain.granule)

        @jax.jit
        def runc(state, xs, chain=chain):
            return lax.scan(chain.apply, state, xs)

        xs2 = cplx.Complex(xs.re[:, :t2], xs.im[:, :t2])
        m = scan_marginal(runc, chain.init_state(), xs2, ks=ks, reps=5)
        print(
            json.dumps(
                {
                    "metric": f"wbfm_chain_{mode}_msps",
                    "value": round(t2 / m["per_tick"] / 1e6, 1),
                    "spread_pct": round(100 * m["spread"], 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

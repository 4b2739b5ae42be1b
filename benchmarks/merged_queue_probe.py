"""MergedRunner on the chip: N independent pipelines as ONE dispatch vs
stepped sequentially (VERDICT r2 weak #6 — the named-queue surface's perf
claim needs a recorded TPU number).

The reference overlaps N per-channel graphs on one GPU via separate CUDA
streams (sdrtest.cpp:331-364); graph/queues.MergedRunner recovers that by
merging the fleet into one XLA program.  This probe measures, for a fleet
of 4 small FM pipelines at different offsets:

  * merged:     scan over ticks of the 4-chain merged step
  * sequential: sum of each chain's own scan-marginal per-tick

and reports the overlap speedup.  Appended to BENCH_configs_rNN.json by
hand once stable.

Run: nohup timeout 1750 python benchmarks/merged_queue_probe.py > /tmp/merged.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import scipy.signal as sps

    import jax
    from jax import lax

    from tpusdr.graph import blocks as B
    from tpusdr.graph.chain import Chain
    from tpusdr.ops import cplx
    from tpusdr.utils.profiling import scan_marginal

    fs = 2e6
    taps = sps.firwin(129, 0.1).astype(np.float32)
    fleet = {
        f"ch{i}": Chain(
            [
                ("shift", B.FreqShift(fs, -(i + 1) * 200e3)),
                ("fir", B.Fir(taps, 8)),
                ("demod", B.QuadFmDemod(gain=1.0)),
            ]
        )
        for i in range(4)
    }
    tick = 1 << 18  # 256k samples/pipeline/tick: small per-member work, the
    # regime where dispatch overlap matters
    # long arms: these chains run a tick in 0.03-0.12 ms, so ks up to 128
    # left the k-gap (~12 ms) inside the tunnel's dispatch jitter and
    # measured 38-155% spreads (r4 first run); 1024-tick arms stretch the
    # gap to ~100 ms.
    ks = (64, 512, 1024)
    rng = np.random.default_rng(0)

    from tpusdr.utils.profiling import tile_ticks

    def make_xs():
        # few unique host ticks, tiled on device (tunnel upload is slow)
        return tile_ticks(
            cplx.Complex(
                rng.standard_normal((8, tick)).astype(np.float32),
                rng.standard_normal((8, tick)).astype(np.float32),
            ),
            max(ks),
        )

    xs_fleet = {name: make_xs() for name in fleet}

    # --- merged: one jitted scan over the whole fleet ----------------------
    def merged_step(states, xs):
        new_states, ys = {}, {}
        for name, chain in fleet.items():
            new_states[name], ys[name] = chain.apply(states[name], xs[name])
        return new_states, ys

    @jax.jit
    def run_merged(states, xs):
        return lax.scan(merged_step, states, xs)

    states0 = {n: c.init_state() for n, c in fleet.items()}
    m = scan_marginal(run_merged, states0, xs_fleet, ks=ks, reps=5)
    merged_tick = m["per_tick"]
    print(
        json.dumps(
            {
                "metric": "merged4_per_tick_ms",
                "value": round(merged_tick * 1e3, 3),
                "spread_pct": round(100 * m["spread"], 1),
            }
        ),
        flush=True,
    )

    # --- sequential: each member scanned alone, per-ticks summed -----------
    seq_total = 0.0
    for name, chain in fleet.items():
        @jax.jit
        def run_one(state, xs, chain=chain):
            return lax.scan(chain.apply, state, xs)

        m1 = scan_marginal(
            run_one, chain.init_state(), xs_fleet[name], ks=ks, reps=5
        )
        seq_total += m1["per_tick"]
        print(
            json.dumps(
                {
                    "metric": f"solo_{name}_per_tick_ms",
                    "value": round(m1["per_tick"] * 1e3, 3),
                    "spread_pct": round(100 * m1["spread"], 1),
                }
            ),
            flush=True,
        )

    print(
        json.dumps(
            {
                "metric": "merged_vs_sequential_speedup",
                "value": round(seq_total / merged_tick, 2),
                "unit": "x",
                "fleet": 4,
                "tick": tick,
                "msps_merged": round(4 * tick / merged_tick / 1e6, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

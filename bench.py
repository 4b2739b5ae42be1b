"""Benchmark: WBFM receiver chain throughput on one chip.

BASELINE.md config 3: wideband FM chain (freq shift -> multistage decimating
FIR -> quad FM demod -> de-emphasis -> resample to 48 kHz) on a single chip.
The reference's implied design point is real-time 20 Msps complex ingest
(HackRF max rate, nbfm_test.cpp:415) on one NVIDIA GPU; `vs_baseline` is
the multiple of that rate this chip sustains.

Methodology (utils/profiling.scan_marginal): the streaming step runs under
lax.scan over K stacked ticks (state carried tick-to-tick — the production
offline path, run_offline in graph/runner.py) at four scan lengths visited
round-robin; a Theil-Sen fit over all (k, time) points is the marginal
per-tick cost, with the interquartile spread of the pairwise slopes
reported as the error bar (always a number, never a crash — VERDICT r3 #1).
This measures what the chip sustains, excluding this environment's ~40 ms
per-dispatch tunnel round-trip (benchmarks/bw_probe.py), which a pipelined
runner hides anyway (StreamRunner pipeline_depth).

Prints ONE JSON line:
  {"metric": "wbfm_chain_msps_per_chip", "value": N, "unit": "Msamples/s",
   "vs_baseline": N/20, "spread_pct": S}
"""

from __future__ import annotations

import json

import numpy as np


def main() -> None:
    import jax
    from jax import lax

    from tpusdr.models import receiver
    from tpusdr.ops import cplx
    from tpusdr.utils.profiling import scan_marginal

    fs = 20.0e6  # bench at the reference's design-point rate
    chain, spec = receiver.fm_receiver(
        rf_sample_rate=fs,
        freq_offset=2.5e6,
        variant=receiver.WBFM,
        audio_rate=48000.0,
    )
    # 2M samples/tick (0.1 s of signal at 20 Msps; 8M ticks measured ~30%
    # slower per sample — HBM pressure from the stacked scan inputs).
    # The MXU chain runs a tick in ~0.5 ms, so the scan arms must stretch
    # until adjacent-arm gaps (~45 ms) dwarf the tunnel's multi-ms dispatch
    # jitter: ks=(4,32,64) measured 21-22% spread in r2.  Four arms give 6
    # pairwise slopes and an interquartile spread (utils/profiling.py) that
    # rejects the short-gap outliers.  xs HBM: 256 ticks x 2M x 8 B = 4 GB —
    # uploaded as 16 unique ticks and tiled to 256 ON DEVICE (a 4 GB host
    # upload through this box's tunnel measured >25 min; the tile is an
    # HBM-speed copy).
    tick = chain.granule * max(1, (1 << 21) // chain.granule)
    ks = (16, 96, 176, 256)
    n_unique = 16

    rng = np.random.default_rng(0)
    from tpusdr.utils.profiling import tile_ticks

    xs = tile_ticks(
        cplx.Complex(
            rng.standard_normal((n_unique, tick)).astype(np.float32),
            rng.standard_normal((n_unique, tick)).astype(np.float32),
        ),
        max(ks),
    )
    state0 = jax.device_put(chain.init_state())

    @jax.jit
    def run(state, xs):
        return lax.scan(chain.apply, state, xs)

    # no max_spread: bench.py is the artifact emitter — it must emit a
    # number with an honest error bar; the hard gate lives in
    # tests/test_perf.py (VERDICT r3 next #1).
    # reps=12: the spread is the IQR of per-round estimates; at reps=8 one
    # run in four measured >10% (r4: 1.8/2.2/3.4 vs one 12.5), the middle-6
    # IQR at reps=12 rejects a whole bad round-robin pass.
    m = scan_marginal(run, state0, xs, ks=ks, reps=12)
    msps = tick / m["per_tick"] / 1e6
    print(
        json.dumps(
            {
                "metric": "wbfm_chain_msps_per_chip",
                "method": "scan_marginal_2m_ticks",
                "value": round(msps, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / 20.0, 2),
                "spread_pct": round(100 * m["spread"], 1),
                "pair_spread_pct": round(100 * m["pair_spread"], 1),
            }
        )
    )


if __name__ == "__main__":
    main()

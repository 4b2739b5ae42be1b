"""Benchmark: WBFM receiver chain throughput on one chip.

BASELINE.md config 3/5: wideband FM chain (freq shift -> decimating FIR ->
quad FM demod -> de-emphasis -> resample to 48 kHz) on a single chip.
The reference's implied design point is real-time 20 Msps complex ingest
(HackRF max rate, nbfm_test.cpp:415) on one NVIDIA GPU; `vs_baseline` is
the multiple of that rate this chip sustains.

Headline method: lax.scan over granule-sized ticks with carried state —
the production offline path (run_offline mode='scan').  r5 measured the
whole-capture 'flat' alternative on chip and it LOSES (4433 vs 5000
Msps chain; the scan's per-tick buffer reuse wins — PROFILE_r05.json,
offline_flat_probe.py), so the scan stays the headline and the metric
name is method-qualified "scan_marginal_2m_ticks" (VERDICT r4 weak #4).
The r5 front end is the zero-copy prelude kernel (kernels/
fir_banded_pallas.banded_fir_prelude): the tick is read straight from
its (N/G, G) reshape by double-buffered DMA, nothing is copied outside
the kernel.

Methodology (utils/profiling.scan_marginal): Theil-Sen slope over scan
lengths visited round-robin — this box's ~40 ms tunnel dispatch makes
dispatch-loop timing garbage; `spread_pct` is the IQR of per-round
estimates (the error bar OF THE ESTIMATE).

Prints ONE JSON line:
  {"metric": "wbfm_chain_msps_per_chip", "method":
   "scan_marginal_2m_ticks", "value": N, "unit": "Msamples/s",
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
    from tpusdr.utils.profiling import scan_marginal, tile_ticks

    fs = 20.0e6  # bench at the reference's design-point rate
    chain, spec = receiver.fm_receiver(
        rf_sample_rate=fs,
        freq_offset=2.5e6,
        variant=receiver.WBFM,
        audio_rate=48000.0,
    )
    # tick = one chain granule (1.28M with the fused front end's 8G rows);
    # arms up to 256 ticks (328M samples).  xs HBM: 256 x 1.28M x 8 B =
    # 2.6 GB — uploaded as 16 unique ticks and tiled ON DEVICE (a 4 GB
    # host upload through this box's tunnel measured >25 min).
    tick = chain.granule * max(1, (1 << 21) // chain.granule)
    ks = (16, 96, 176, 256)
    n_unique = 16

    rng = np.random.default_rng(0)
    xs = tile_ticks(
        cplx.Complex(
            rng.standard_normal((n_unique, tick)).astype(np.float32),
            rng.standard_normal((n_unique, tick)).astype(np.float32),
        ),
        max(ks),
    )
    state0 = jax.device_put(chain.init_state())

    @jax.jit
    def run_scan(state, xs):
        return lax.scan(chain.apply, state, xs)

    # no max_spread: bench.py is the artifact emitter — it must emit a
    # number with an honest error bar; the hard gate lives in
    # tests/test_perf.py.  reps=12: spread is the IQR of per-round
    # estimates (middle-6 rejects a whole bad round-robin pass).
    m_scan = scan_marginal(run_scan, state0, xs, ks=ks, reps=12)
    scan_msps = tick / m_scan["per_tick"] / 1e6
    print(
        json.dumps(
            {
                "metric": "wbfm_chain_msps_per_chip",
                "method": "scan_marginal_2m_ticks",
                "value": round(scan_msps, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(scan_msps / 20.0, 2),
                "spread_pct": round(100 * m_scan["spread"], 1),
                "pair_spread_pct": round(100 * m_scan["pair_spread"], 1),
                "tick": tick,
            }
        )
    )


if __name__ == "__main__":
    main()

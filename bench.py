"""Benchmark: WBFM receiver chain throughput on one chip.

BASELINE.md config 3: wideband FM chain (freq shift -> multistage decimating
FIR -> quad FM demod -> de-emphasis -> resample to 48 kHz) on a single chip.
The reference's implied design point is real-time 20 Msps complex ingest
(HackRF max rate, nbfm_test.cpp:415) on one NVIDIA GPU; `vs_baseline` is
the multiple of that rate this chip sustains.

Methodology: the streaming step runs under lax.scan over K stacked ticks
(state carried tick-to-tick — the production offline path, run_offline in
graph/runner.py), timed at two scan lengths; the slope is the marginal
per-tick cost.  This measures what the chip sustains, excluding this
environment's ~40 ms per-dispatch tunnel round-trip (benchmarks/bw_probe.py),
which a pipelined runner hides anyway (StreamRunner pipeline_depth).

Prints ONE JSON line:
  {"metric": "wbfm_chain_msps_per_chip", "value": N, "unit": "Msamples/s",
   "vs_baseline": N/20}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    from jax import lax

    from tpusdr.models import receiver
    from tpusdr.ops import cplx

    fs = 20.0e6  # bench at the reference's design-point rate
    chain, spec = receiver.fm_receiver(
        rf_sample_rate=fs,
        freq_offset=2.5e6,
        variant=receiver.WBFM,
        audio_rate=48000.0,
    )
    # ~4M samples/tick (0.2 s of signal at 20 Msps), K ticks resident in HBM
    # (8M ticks measured ~30% slower per sample — HBM pressure from the
    # stacked scan inputs).
    tick = chain.granule * max(1, (1 << 22) // chain.granule)
    K1, K2 = 4, 12

    rng = np.random.default_rng(0)
    xs = cplx.Complex(
        jax.device_put(rng.standard_normal((K2, tick)).astype(np.float32)),
        jax.device_put(rng.standard_normal((K2, tick)).astype(np.float32)),
    )
    state0 = jax.device_put(chain.init_state())

    def step(state, x):
        return chain.apply(state, x)

    @jax.jit
    def run(state, xs):
        return lax.scan(step, state, xs)

    def timed(k: int) -> float:
        s, ys = run(state0, jax.tree.map(lambda a: a[:k], xs))
        jax.block_until_ready(ys)
        t0 = time.perf_counter()
        s, ys = run(state0, jax.tree.map(lambda a: a[:k], xs))
        jax.block_until_ready(ys)
        return time.perf_counter() - t0

    # min-of-5 per scan length: the tunnel adds multi-ms jitter per dispatch
    t1 = min(timed(K1) for _ in range(5))
    t2 = min(timed(K2) for _ in range(5))
    per_tick = (t2 - t1) / (K2 - K1)
    # Jitter can still corrupt the slope (t1 caught a slow dispatch).  The
    # K2-average includes the fixed dispatch cost, so it is a safe lower
    # bound on throughput: clamp the marginal estimate into (0, avg].
    avg = t2 / K2
    if not (0.0 < per_tick <= avg):
        per_tick = avg

    msps = tick / per_tick / 1e6
    print(
        json.dumps(
            {
                "metric": "wbfm_chain_msps_per_chip",
                "value": round(msps, 2),
                "unit": "Msamples/s",
                "vs_baseline": round(msps / 20.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

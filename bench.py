"""Benchmark: WBFM receiver chain throughput on one chip.

BASELINE.md config 3: wideband FM chain (freq shift -> decimating FIR ->
quad FM demod -> de-emphasis -> resample to 48 kHz) on a single chip.
The reference's implied design point is real-time 20 Msps complex ingest
(HackRF max rate, nbfm_test.cpp:415) on one NVIDIA GPU; `vs_baseline` is
the multiple of that rate this chip sustains.

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

    from tpusdr.models import receiver
    from tpusdr.ops import cplx

    fs = 20.0e6  # bench at the reference's design-point rate
    chain, spec = receiver.fm_receiver(
        rf_sample_rate=fs,
        freq_offset=2.5e6,
        variant=receiver.WBFM,
        audio_rate=48000.0,
    )
    # ~8M samples/tick: amortizes the per-dispatch cost (~3 ms through this
    # environment's TPU tunnel) against compute. A production streaming
    # deployment at 20 Msps would run ~0.4 s of signal per dispatch anyway.
    tick = chain.granule * max(1, (1 << 23) // chain.granule)

    rng = np.random.default_rng(0)
    z = (rng.standard_normal(tick) + 1j * 0.5 * rng.standard_normal(tick)).astype(
        np.complex64
    )
    x = jax.device_put(cplx.from_numpy(z))
    state = jax.device_put(chain.init_state())

    step = jax.jit(chain.apply, donate_argnums=(0,))

    # compile + warmup
    state, y = step(state, x)
    jax.block_until_ready(y)
    state, y = step(state, x)
    jax.block_until_ready(y)

    # measure: device-resident streaming steps (the compute path the chip
    # sustains; host ingest is overlapped by the runner's async pipeline)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        state, y = step(state, x)
    jax.block_until_ready(y)
    dt = time.perf_counter() - t0

    msps = iters * tick / dt / 1e6
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

"""Probe: MXU matmul precision for the banded-matmul FIR path.

The dot_general precision tiers on v5e (bf16 passes per f32 product:
DEFAULT=1, HIGH=3, HIGHEST=6) trade accuracy for throughput.  This probe
measures, at the production WBFM RF shape (T=546, D=50, FC):

  * throughput (scan-marginal Msps) per tier;
  * accuracy per tier vs a float64 scipy reference on realistic signals
    (error power in dB relative to output power).

Decision input for ops/fir.py _MXU_PRECISION: the design bar is -60 dB
stopband (BASELINE.md); the sharding suite asserts -80..-100 dB.  A tier
is eligible as default only if its error floor sits well below -100 dB.

Run (one process against the TPU at a time):
    nohup timeout 560 python benchmarks/fir_precision_probe.py > /tmp/prec_probe.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import scipy.signal as sps
    from jax import lax

    from tpusdr.ops import cplx
    from tpusdr.utils.profiling import scan_marginal

    T, D = 546, 50
    tick = ((1 << 21) // D) * D
    KS = (4, 32, 64)
    rng = np.random.default_rng(0)
    taps = sps.firwin(T, 0.015).astype(np.float32)

    sig = (
        rng.standard_normal(tick) + 1j * rng.standard_normal(tick)
    ).astype(np.complex64)
    # fir_full prepends T-1 zeros of history, so its output grid is
    # lfilter[::D] (y[m] = sum_j h[j] x[m*D - j]); CPU f32 sits at -129 dB
    # on this reference, the f32 floor for the tier comparison.
    ref64 = sps.lfilter(taps.astype(np.float64), [1.0], sig.astype(np.complex128))
    ref64 = ref64[::D]

    xs = cplx.Complex(
        jax.device_put(rng.standard_normal((max(KS), tick)).astype(np.float32)),
        jax.device_put(rng.standard_normal((max(KS), tick)).astype(np.float32)),
    )

    from tpusdr.ops import fir

    for tier in ("highest", "high", "default"):
        # precision threads through as a per-call parameter (no module
        # reload: stale-reference trap, ADVICE r2)
        prec = getattr(lax.Precision, tier.upper())

        # accuracy: one tick vs float64 reference
        y = fir.fir_full(cplx.from_numpy(sig), taps, D, mode="mxu", precision=prec)
        yn = cplx.to_numpy(y)
        m = min(len(yn), len(ref64))
        err = yn[:m] - ref64[:m]
        err_db = 10 * np.log10(
            np.mean(np.abs(err) ** 2) / np.mean(np.abs(ref64[:m]) ** 2)
        )

        # throughput: scan-marginal over carried streaming ticks
        state0 = jax.device_put(fir.fir_init_state(taps, "pair"))

        def step(s, x):
            return fir.fir_apply(s, x, taps, D, mode="mxu", precision=prec)

        @jax.jit
        def run(state, xs):
            return lax.scan(step, state, xs)

        try:
            meas = scan_marginal(run, state0, xs, ks=KS, reps=4)
            msps = round(tick / meas["per_tick"] / 1e6, 1)
            spread = round(100 * meas["spread"], 1)
        except RuntimeError as e:
            msps, spread = None, str(e)
        print(
            json.dumps(
                {
                    "precision": tier,
                    "msps_in": msps,
                    "spread_pct": spread,
                    "err_db_vs_f64": round(float(err_db), 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

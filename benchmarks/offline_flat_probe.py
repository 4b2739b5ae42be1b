"""Whole-capture (flat) offline path vs the lax.scan tick path.

VERDICT r4 next #1: every chain sits 3.7-14x off its measured HBM floor,
and the named dominant cause is the scan's per-tick machinery — the
stacked-input dynamic-slice copy, plus the per-tick history-concat and
banded-prep pad copies inside the front end (each a full-rate HBM
read+write), plus the ~40 us fixed per-tick cost.  Applying the chain to
the WHOLE capture as ONE block (chunking invariance guarantees identical
samples — tests/test_graph_chain.py) pays the concat/pad copies once per
capture instead of once per 2M tick and drops the scan slice + fixed cost
entirely.

Measures, with the same scan-marginal/Theil-Sen method as bench.py
(slope over capture length, so constant costs cancel):

  * wbfm scan path (status quo, 2M ticks)     -> wbfm_chain_msps_scan2m
  * wbfm flat whole-capture path              -> wbfm_chain_msps_flat
  * isolated fused front end, scan vs flat    -> frontend_msps_{scan2m,flat}

Run: nohup timeout 1750 python benchmarks/offline_flat_probe.py > /tmp/offline_flat.log 2>&1 &

MEASURED (v5e 2026-08-21, r4 code): the hypothesis is FALSE — the flat
whole-capture path is ~1.7x SLOWER, and the attribution is the front end
itself, not the tail stages:

    wbfm_chain_msps_scan2m 4866.9 (3.0%)   frontend_msps_scan2m 5671.7 (24%)
    wbfm_chain_msps_flat   2820.0 (2.1%)   frontend_msps_flat   3268.6 (17%)

Per 335M-sample arm the flat path allocates/frees ~5.4 GB of one-shot
concat+pad buffers whose cost scales with length (so it lands in the
marginal slope), while the scan path reuses the same 17 MB per-tick
buffers for every iteration.  The scan over 2M ticks IS the right
offline shape on this machine; the roofline levers are inside the tick
(single-copy history prep + double-buffered kernel DMA,
benchmarks/kernel_floor_probe.py), not in removing the scan.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument(
        "--only", default="all", choices=("all", "chain", "frontend"),
        help="limit scope (each arm is a fresh ~1-5 min tunnel compile)",
    )
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from jax import lax

    from tpusdr.graph.blocks import FusedFmDemod
    from tpusdr.models import receiver
    from tpusdr.ops import cplx
    from tpusdr.utils.profiling import scan_marginal, tile_ticks

    fs = 20.0e6
    chain, spec = receiver.fm_receiver(
        rf_sample_rate=fs, freq_offset=2.5e6, variant=receiver.WBFM,
        audio_rate=48000.0,
    )
    emit(note="chain", rf_stages=list(spec.rf_stages), granule=chain.granule)

    tick = chain.granule * max(1, (1 << 21) // chain.granule)
    # flat arms reach k*tick samples in ONE block: peak HBM = xs stack +
    # history-concat copy + banded pad copy ~ 3x the largest arm (2.7 GB
    # each at k=160) — comfortably inside 16 GB.
    ks = (16, 64, 112, 160)
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

    @jax.jit
    def run_flat(state, xs):
        flat = cplx.Complex(xs.re.reshape(-1), xs.im.reshape(-1))
        return chain.apply(state, flat)

    if args.only in ("all", "chain"):
        for name, fn in (("scan2m", run_scan), ("flat", run_flat)):
            m = scan_marginal(fn, state0, xs, ks=ks, reps=args.reps)
            emit(
                metric=f"wbfm_chain_msps_{name}",
                value=round(tick / m["per_tick"] / 1e6, 2),
                spread_pct=round(100 * m["spread"], 1),
                times_ms={k: round(v * 1e3, 1) for k, v in m["times"].items()},
            )
    if args.only == "chain":
        return

    # isolated fused front end (shift+FIR+decim+demod, no deemph/resampler)
    fe = FusedFmDemod(fs, -2.5e6, _wbfm_taps(fs), int(spec.rf_decimation),
                      gain=spec.quad_gain)
    fes = jax.device_put(fe.init_state())

    @jax.jit
    def fe_scan(state, xs):
        return lax.scan(fe.apply, state, xs)

    @jax.jit
    def fe_flat(state, xs):
        flat = cplx.Complex(xs.re.reshape(-1), xs.im.reshape(-1))
        return fe.apply(state, flat)

    for name, fn in (("scan2m", fe_scan), ("flat", fe_flat)):
        m = scan_marginal(fn, fes, xs, ks=ks, reps=args.reps)
        emit(
            metric=f"frontend_msps_{name}",
            value=round(tick / m["per_tick"] / 1e6, 2),
            spread_pct=round(100 * m["spread"], 1),
            times_ms={k: round(v * 1e3, 1) for k, v in m["times"].items()},
        )


def _wbfm_taps(fs):
    from tpusdr.ops import design

    return design.lowpass_taps(fs, 100e3, 100e3, -60.0)


if __name__ == "__main__":
    main()

"""Multistage front end at the 100 MHz design point: cascade vs single stage.

VERDICT r4 missing #2 / next #3: ``use_fused='auto'`` keeps the unfused
cascade for multi-stage plans on the *argument* that a cascade does fewer
MACs than one big stage; no measurement existed at a 100 Msps-class rate.
This probe measures, on chip, the full WBFM chain at fs=100 MHz in its two
buildable forms:

  * cascade  (multistage=True):  (564,125) + (23,2) RF stages — the plan
    use_fused='auto' selects;
  * single   (multistage=False, use_fused=False): one (~2730, 250) stage.

The single-stage FUSED form is not buildable at this design point: the
banded kernel's eligibility (fir_banded_pallas.eligible) rejects
T~2730/D=250 (tap matrix ~35 MB, 4x the VMEM cap), which the probe
records — 'auto' therefore has a measured answer for multistage plans:
the cascade, by the margin printed here.

Run: nohup timeout 1750 python benchmarks/multistage_probe.py > /tmp/multistage.log 2>&1 &
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
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from jax import lax

    from tpusdr.kernels.fir_banded_pallas import eligible
    from tpusdr.models import receiver
    from tpusdr.ops import cplx, design
    from tpusdr.utils.profiling import scan_marginal, tile_ticks

    fs = 100.0e6
    ks = (8, 48, 88)
    rng = np.random.default_rng(0)

    variants = {
        "cascade": dict(multistage=True, use_fused=False),
        "singlestage": dict(multistage=False, use_fused=False),
    }
    xs_cache = {}
    for name, kw in variants.items():
        chain, spec = receiver.fm_receiver(
            fs, 2.5e6, receiver.WBFM, 48000.0, **kw
        )
        tick = chain.granule * max(1, (1 << 21) // chain.granule)
        if tick not in xs_cache:
            xs_cache[tick] = tile_ticks(
                cplx.Complex(
                    rng.standard_normal((8, tick)).astype(np.float32),
                    rng.standard_normal((8, tick)).astype(np.float32),
                ),
                max(ks),
            )
        xs = xs_cache[tick]
        state0 = jax.device_put(chain.init_state())

        @jax.jit
        def run(state, xs, chain=chain):
            return lax.scan(chain.apply, state, xs)

        m = scan_marginal(run, state0, xs, ks=ks, reps=args.reps)
        emit(
            metric=f"wbfm100_{name}_msps",
            method="scan_marginal_2m_ticks",
            value=round(tick / m["per_tick"] / 1e6, 2),
            spread_pct=round(100 * m["spread"], 1),
            rf_stages=list(spec.rf_stages),
            total_rf_taps=spec.rf_taps,
        )

    # the fused single stage is shape-ineligible at this design point
    t_single = design.lowpass_taps(fs, 100e3, 100e3, -60.0)
    emit(
        note="fused_single_stage_eligibility",
        taps=len(t_single),
        decimation=250,
        eligible=eligible(len(t_single), 250, complex_taps=True),
    )


if __name__ == "__main__":
    main()

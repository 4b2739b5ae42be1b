"""Banded Pallas kernel in isolation vs its own memory floor.

Roofline attribution (VERDICT r5 task 1): the fused front end's budget =
scan xs slice + prep copy + kernel(DMA + MXU) + decimated tail math.
This probe measures, at the WBFM shape (T=546, D=50, 2.1 Ms ticks):

  a) the raw kernel with the r5 single-copy history prep
     (banded_fir_pallas(x, history=tail)) under scan — per-tick ms and
     implied HBM GB/s against the measured 561.5 GB/s 2-D ceiling
     (MACHINE_r04.json);
  b) the same but zero-history (pure kernel+pad, no concat term);
  c) the r4 two-copy form (concat outside, no history param) for the
     before/after delta.

Run: nohup timeout 1750 python benchmarks/kernel_floor_probe.py > /tmp/kernel_floor.log 2>&1 &
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
        "--precision", default=None, choices=("default", "high", "highest"),
        help="kernel MXU precision (TPUSDR_KERNEL_PRECISION)",
    )
    ap.add_argument(
        "--only", default="all", choices=("all", "prelude", "legacy"),
    )
    args = ap.parse_args()

    if args.precision:
        os.environ["TPUSDR_KERNEL_PRECISION"] = args.precision

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import scipy.signal as sps
    from jax import lax

    from tpusdr.kernels.dispatch import pallas_mode
    from tpusdr.kernels.fir_banded_pallas import (
        _GUARD,
        banded_fir_pallas,
        banded_fir_prelude,
        prelude_plan,
    )
    from tpusdr.ops import cplx, fir
    from tpusdr.utils.profiling import scan_marginal, tile_ticks

    interpret = pallas_mode() == "interpret"
    fs = 20e6
    T, D = 546, 50
    taps = sps.firwin(T, 2 * 100e3 / fs).astype(np.float32)
    shift = np.exp(-2j * np.pi * 2.5e6 / fs * np.arange(T)).astype(np.complex64)
    ctaps = (taps * shift).astype(np.complex64)

    G, _B = prelude_plan(T, D)
    tick = (1 << 21) // (_GUARD * G) * (_GUARD * G)  # 8G rows: both forms take it
    ks = (16, 96, 176, 256)
    rng = np.random.default_rng(0)
    xs = tile_ticks(
        cplx.Complex(
            rng.standard_normal((16, tick)).astype(np.float32),
            rng.standard_normal((16, tick)).astype(np.float32),
        ),
        max(ks),
    )
    tail0 = cplx.Complex(
        np.zeros(T - 1, np.float32), np.zeros(T - 1, np.float32)
    )

    if args.only in ("all", "prelude"):
        # --- value check COMPILED on chip (host fetch is the only fault
        # surface, CLAUDE.md), prelude kernel vs the XLA mxu windows ----
        pre0 = cplx.Complex(
            np.zeros((_GUARD, G), np.float32),
            np.zeros((_GUARD, G), np.float32),
        )
        x1 = cplx.Complex(
            np.asarray(xs.re[0]), np.asarray(xs.im[0])
        )

        @jax.jit
        def run_pre_once(x, pre):
            return banded_fir_prelude(x, pre, ctaps, D, interpret)

        yp = run_pre_once(x1, pre0)
        p0 = _GUARD * G - (T - 1)
        flat = cplx.Complex(
            np.concatenate([np.zeros(_GUARD * G, np.float32), x1.re]),
            np.concatenate([np.zeros(_GUARD * G, np.float32), x1.im]),
        )

        @jax.jit
        def run_ref(x):
            return fir.fir_extended(x, ctaps, D, mode="mxu")

        yref = run_ref(flat[..., p0:])
        M = tick // D
        pr, pi = np.asarray(yp.re), np.asarray(yp.im)
        rr, ri = np.asarray(yref.re)[:M], np.asarray(yref.im)[:M]
        scale = max(np.abs(rr).max(), np.abs(ri).max())
        err = max(np.abs(pr - rr).max(), np.abs(pi - ri).max()) / scale
        emit(
            check="prelude_vs_xla_on_chip",
            rel_err=float(f"{err:.3g}"),
            precision=os.environ.get("TPUSDR_KERNEL_PRECISION", "highest"),
            ok=bool(err < 5e-5),
        )

        # --- prelude kernel under scan (row-carry streaming) ------------
        pre_state = cplx.Complex(
            np.zeros((_GUARD, G), np.float32), np.zeros((_GUARD, G), np.float32)
        )

        @jax.jit
        def run_prelude(pre, xs):
            def step(pre, x):
                y = banded_fir_prelude(x, pre, ctaps, D, interpret)
                new = cplx.Complex(
                    x.re[x.shape[-1] - _GUARD * G :].reshape(_GUARD, G),
                    x.im[x.shape[-1] - _GUARD * G :].reshape(_GUARD, G),
                )
                return new, y

            return lax.scan(step, pre, xs)

        m = scan_marginal(
            run_prelude, jax.device_put(pre_state), xs, ks=ks, reps=args.reps
        )
        msps = tick / m["per_tick"] / 1e6
        emit(
            metric="kernel_prelude_msps",
            value=round(msps, 1),
            spread_pct=round(100 * m["spread"], 1),
            per_tick_ms=round(m["per_tick"] * 1e3, 3),
            precision=os.environ.get("TPUSDR_KERNEL_PRECISION", "highest"),
            implied_min_traffic_gbps=round(msps * 1e6 * 8 * (1 + 2 / D) / 1e9, 1),
        )
    if args.only == "prelude":
        return

    @jax.jit
    def run_hist(tail, xs):
        def step(tail, x):
            y = banded_fir_pallas(x, ctaps, D, interpret, history=tail)
            return x[..., x.shape[-1] - (T - 1) :], y

        return lax.scan(step, tail, xs)

    @jax.jit
    def run_nohist(carry, xs):
        def step(c, x):
            return c, banded_fir_pallas(x, ctaps, D, interpret)

        return lax.scan(step, carry, xs)

    @jax.jit
    def run_concat(tail, xs):
        def step(tail, x):
            ext = cplx.concat([tail, x], axis=-1)
            y = banded_fir_pallas(ext, ctaps, D, interpret)
            return ext[..., ext.shape[-1] - (T - 1) :], y

        return lax.scan(step, tail, xs)

    cases = (
        ("kernel_hist1copy", run_hist, tail0),
        ("kernel_nohist", run_nohist, np.float32(0)),
        ("kernel_concat2copy", run_concat, tail0),
    )
    for name, fn, c0 in cases:
        m = scan_marginal(fn, jax.device_put(c0), xs, ks=ks, reps=args.reps)
        msps = tick / m["per_tick"] / 1e6
        # min traffic: read 8 B/sample (pair) once + decimated write
        gbps = msps * 1e6 * 8 * (1 + 2 / D) / 1e9
        emit(
            metric=f"{name}_msps",
            value=round(msps, 1),
            spread_pct=round(100 * m["spread"], 1),
            per_tick_ms=round(m["per_tick"] * 1e3, 3),
            implied_min_traffic_gbps=round(gbps, 1),
            ceiling_2d_gbps=561.5,
        )


if __name__ == "__main__":
    main()

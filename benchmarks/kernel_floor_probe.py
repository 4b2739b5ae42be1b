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
        "--only", default="all",
        choices=("all", "prelude", "legacy", "dma", "noslice"),
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

    if args.only == "dma":
        # chunk width must be whole 128-lane tiles: G=6400 has 50 tiles,
        # so valid column splits divide 50
        for n_split in (2, 5, 10):
            dma_floor(args, tick, ks, xs, n_split=n_split)
        return

    if args.only == "noslice":
        # prelude kernel on a CLOSED-OVER single tick: the scan body never
        # slices xs, isolating the stacked-input slice copy's cost
        pre_state = cplx.Complex(
            np.zeros((_GUARD, G), np.float32),
            np.zeros((_GUARD, G), np.float32),
        )
        x_fix = cplx.Complex(xs.re[0], xs.im[0])

        @jax.jit
        def run_noslice(pre, dummy):
            import jax.numpy as jnp

            def step(pre, _):
                y = banded_fir_prelude(x_fix, pre, ctaps, D, interpret)
                # thread the output back into the carry so XLA cannot
                # hoist the loop-invariant kernel call out of the scan
                # (the first run measured 0.001 ms/tick: fully hoisted);
                # the perturbation is numerically nil (~1e-38 * y)
                c = 1.0 + y.re[0] * jnp.float32(1e-38)
                return cplx.Complex(pre.re * c, pre.im * c), y[::1024]

            return lax.scan(step, pre, dummy)

        m = scan_marginal(
            run_noslice,
            jax.device_put(pre_state),
            np.zeros((max(ks), 1), np.float32),
            ks=ks,
            reps=args.reps,
        )
        msps = tick / m["per_tick"] / 1e6
        emit(
            metric="kernel_prelude_noslice_msps",
            value=round(msps, 1),
            per_tick_ms=round(m["per_tick"] * 1e3, 3),
            spread_pct=round(100 * m["spread"], 1),
            precision=os.environ.get("TPUSDR_KERNEL_PRECISION", "highest"),
        )
        return

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




def dma_floor(args, tick, ks, xs, n_split: int = 1):
    """Pure DMA + output-write kernel: the kernel's memory floor with zero
    MXU work — isolates the HBM->VMEM DMA rate the prelude kernel sees.
    ``n_split``: split each plane's tile into that many column chunks
    issued as CONCURRENT DMAs (the multi-engine trick)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpusdr.ops import cplx
    from tpusdr.utils.profiling import scan_marginal

    G = 6400
    n_rows = tick // G
    R = 160 if n_rows % 160 == 0 else 40
    n_prog = n_rows // R

    C = G // n_split

    def kern(xr_ref, xi_ref, or_ref, oi_ref, s0r, s0i, s1r, s1i,
             *sems, R, n_prog):
        k = pl.program_id(0)
        n = pl.num_programs(0)
        half = len(sems) // 2

        def copies(kk, sr, si, slot):
            ms = sems[slot * half : (slot + 1) * half]
            out = []
            for c in range(n_split):
                out.append(pltpu.make_async_copy(
                    xr_ref.at[pl.ds(kk * R, R), pl.ds(c * C, C)],
                    sr.at[:, pl.ds(c * C, C)],
                    ms[2 * c],
                ))
                out.append(pltpu.make_async_copy(
                    xi_ref.at[pl.ds(kk * R, R), pl.ds(c * C, C)],
                    si.at[:, pl.ds(c * C, C)],
                    ms[2 * c + 1],
                ))
            return out

        @pl.when(k == 0)
        def _():
            for cp in copies(0, s0r, s0i, 0):
                cp.start()

        if n_prog > 1:

            @pl.when((k + 1 < n) & (k % 2 == 0))
            def _():
                for cp in copies(k + 1, s1r, s1i, 1):
                    cp.start()

            @pl.when((k + 1 < n) & (k % 2 == 1))
            def _():
                for cp in copies(k + 1, s0r, s0i, 0):
                    cp.start()

        def emit_out(sr, si, slot):
            for cp in copies(k, sr, si, slot):
                cp.wait()
            or_ref[:] = sr[0:R, 0:128]
            oi_ref[:] = si[0:R, 0:128]

        @pl.when(k % 2 == 0)
        def _():
            emit_out(s0r, s0i, 0)

        @pl.when(k % 2 == 1)
        def _():
            emit_out(s1r, s1i, 1)

    def dma_once(x):
        fr = x.re.reshape(n_rows, G)
        fi = x.im.reshape(n_rows, G)
        yr, yi = pl.pallas_call(
            functools.partial(kern, R=R, n_prog=n_prog),
            grid=(n_prog,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((R, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda k: (k, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
                jax.ShapeDtypeStruct((n_rows, 128), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((R, G), jnp.float32),
                pltpu.VMEM((R, G), jnp.float32),
                pltpu.VMEM((R, G), jnp.float32),
                pltpu.VMEM((R, G), jnp.float32),
            ] + [pltpu.SemaphoreType.DMA] * (4 * n_split),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
        )(fr, fi)
        return cplx.Complex(yr, yi)

    @jax.jit
    def run(c, xs):
        def step(c, x):
            return c, dma_once(x)

        return lax.scan(step, c, xs)

    m = scan_marginal(run, jax.device_put(np.float32(0)), xs, ks=ks,
                      reps=args.reps)
    msps = tick / m["per_tick"] / 1e6
    emit(
        metric=f"dma_floor_split{n_split}_msps",
        value=round(msps, 1),
        per_tick_ms=round(m["per_tick"] * 1e3, 3),
        spread_pct=round(100 * m["spread"], 1),
        dma_gbps=round(msps * 1e6 * 8 / 1e9, 1),
        note="DMA in + (R,128) out only; includes the scan slice like "
        "every other arm",
    )


if __name__ == "__main__":
    main()

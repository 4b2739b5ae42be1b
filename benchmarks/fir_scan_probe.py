"""Trusted absolute FIR timings: lax.scan over K streaming ticks, slope
between K=4 and K=12 removes fixed dispatch overhead; the scan carry makes
every tick's work data-dependent (no elision, no overlap).

Variants: poly (current), accum, conv_mxu, two_stage_accum.
Run each separately (compiles through the tunnel are slow):

  for v in poly accum conv_mxu two_stage; do
    timeout 560 python benchmarks/fir_scan_probe.py $v >> /tmp/firscan.log 2>&1
  done
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 21  # per tick (keeps K=12 stacked ticks in HBM comfortably)


def _scan_time(step, state, xs, k):
    import jax
    from jax import lax

    @jax.jit
    def run(state, xs):
        return lax.scan(step, state, xs)

    s, ys = run(state, xs[:k])
    jax.block_until_ready(ys)
    t0 = time.perf_counter()
    s, ys = run(state, xs[:k])
    jax.block_until_ready(ys)
    return time.perf_counter() - t0


def main() -> None:
    variant = sys.argv[1]

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpusdr.ops import cplx, design, fir
    from tpusdr.utils.numerics import cdiv

    fs, D = 20.0e6, 50
    taps = design.lowpass_taps(fs, 100e3, 100e3, -60.0)
    T = len(taps)
    h = jnp.asarray(taps.astype(np.float32))

    rng = np.random.default_rng(0)
    K = 12
    z = rng.standard_normal((K, N)).astype(np.float32)
    xs = cplx.Complex(jnp.asarray(z), jnp.asarray(0.5 * z))
    state0 = cplx.zeros((T - 1,))

    if variant in ("poly", "accum", "conv_mxu"):
        P = cdiv(T, D)
        h_pad = (
            jnp.zeros((P * D,), jnp.float32).at[:T].set(jnp.flip(h)).reshape(P, D)
        )
        M = N // D

        def core_poly(ext):
            return fir.fir_extended(ext, h, D, "poly")

        def core_accum(ext):
            x2 = jnp.stack([ext.re, ext.im], axis=0)
            need = (M + P - 1) * D
            pad = need - x2.shape[-1]
            x2 = jnp.pad(x2, ((0, 0), (0, pad))) if pad > 0 else x2[..., :need]
            frames = x2.reshape(2, M + P - 1, D)
            acc = jnp.zeros((2, M), jnp.float32)
            for p in range(P):
                w = lax.slice_in_dim(frames, p, p + M, axis=-2)
                acc = acc + jnp.einsum("cmd,d->cm", w, h_pad[p])
            return cplx.Complex(acc[0], acc[1])

        def core_conv_mxu(ext):
            x2 = jnp.stack([ext.re, ext.im], axis=0)
            need = (M + P - 1) * D
            pad = need - x2.shape[-1]
            x2 = jnp.pad(x2, ((0, 0), (0, pad))) if pad > 0 else x2[..., :need]
            frames = x2.reshape(2, M + P - 1, D).transpose(0, 2, 1)
            rhs = h_pad.T[None]
            y = lax.conv_general_dilated(
                frames, rhs, (1,), "VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                preferred_element_type=jnp.float32,
            )
            return cplx.Complex(y[0, 0], y[1, 0])

        core = {"poly": core_poly, "accum": core_accum, "conv_mxu": core_conv_mxu}[
            variant
        ]

        def step(state, x):
            ext = cplx.concat([state, x], axis=-1)
            y = core(ext)
            return ext[..., ext.shape[-1] - (T - 1):], y

        state = state0

    elif variant == "two_stage":
        h1 = jnp.asarray(design.lowpass_taps(fs, 100e3, 2e6 - 2e5, -60.0), jnp.float32)
        h2 = jnp.asarray(
            design.lowpass_taps(fs / 10, 100e3, 100e3, -60.0), jnp.float32
        )
        T1, T2 = h1.shape[-1], h2.shape[-1]
        print(json.dumps({"two_stage_taps": [T1, T2]}), flush=True)

        def step(state, x):
            s1, s2 = state
            e1 = cplx.concat([s1, x], axis=-1)
            y1 = fir.fir_extended(e1, h1, 10, "poly")
            e2 = cplx.concat([s2, y1], axis=-1)
            y2 = fir.fir_extended(e2, h2, 5, "poly")
            return (
                e1[..., e1.shape[-1] - (T1 - 1):],
                e2[..., e2.shape[-1] - (T2 - 1):],
            ), y2

        state = (cplx.zeros((T1 - 1,)), cplx.zeros((T2 - 1,)))
    else:
        raise SystemExit(f"unknown variant {variant}")

    t4 = _scan_time(step, state, xs, 4)
    t12 = _scan_time(step, state, xs, 12)
    per = (t12 - t4) / 8.0
    print(
        json.dumps(
            {
                "variant": variant,
                "per_tick_ms": round(per * 1e3, 3),
                "msps": round(N / per / 1e6, 1),
                "t4_ms": round(t4 * 1e3, 2),
                "t12_ms": round(t12 * 1e3, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

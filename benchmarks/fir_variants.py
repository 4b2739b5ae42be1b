"""Sweep decimating-FIR implementations on TPU to pick the fastest.

The headline WBFM chain spends ~100% of its time in the 546-tap / D=50 RF
FIR (benchmarks/profile_stages.py).  HBM speed-of-light for that op is
~0.5 ms per 8.4 Ms tick (read 67 MB, write 1.3 MB); the shipped poly path
measures ~19 ms.  Candidates:

  poly_stack : current _fir_poly (stack P shifted frames, one einsum)
  poly_accum : same decomposition, Python-loop accumulation (no P-stack
               materialization)
  poly_matvec: stack reshaped to (.., M, P*D), single dot with flat taps
  conv       : lax.conv_general_dilated stride-D (XLA's conv lowering)
  conv_mxu   : conv with the polyphase reshape as a (D-channel) feature dim:
               lhs (B, D, M+P-1), rhs (1, D, P) -> MXU-friendly grouped form
  fft        : matmul-DFT overlap-save
  two_stage  : D = 10 then 5, relaxed first-stage filter (multistage design)

Run: nohup timeout 560 python benchmarks/fir_variants.py > /tmp/firvar.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_fn(fn, *args, iters=8):
    import jax

    y = fn(*args)
    jax.block_until_ready(y)
    y = fn(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=[])
    want = set(ap.parse_args().variants)

    def sel(name):
        return not want or name in want

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpusdr.ops import cplx, design, fir
    from tpusdr.utils.numerics import cdiv

    fs = 20.0e6
    D = 50
    taps = design.lowpass_taps(fs, 100e3, 100e3, -60.0)
    T = len(taps)
    N = 1 << 23
    M = (N - (T - 1) + (T - 1)) // D  # streaming: state prepended
    print(json.dumps({"taps": T, "D": D, "N": N}))

    rng = np.random.default_rng(0)
    z = (rng.standard_normal(N + T - 1) + 1j * rng.standard_normal(N + T - 1)).astype(
        np.complex64
    )
    x_ext = jax.device_put(cplx.from_numpy(z))  # pair, extended w/ history
    h = jnp.asarray(taps.astype(np.float32))

    results = {}

    def report(k, v):
        ms = v if isinstance(v, str) else round(v * 1e3, 3)
        rate = None if isinstance(v, str) else round(N / v / 1e6, 1)
        print(json.dumps({"variant": k, "ms": ms, "msps": rate}), flush=True)

    # --- current poly path --------------------------------------------------
    if sel("poly_stack"):
        f_poly = jax.jit(lambda xe: fir.fir_extended(xe, h, D, "poly"))
        report("poly_stack", _time_fn(f_poly, x_ext))

    # --- accumulation loop (no stack) ----------------------------------------
    P = cdiv(T, D)
    h_rev = jnp.flip(h)
    h_pad = jnp.zeros((P * D,), jnp.float32).at[:T].set(h_rev).reshape(P, D)
    Mv = fir.num_outputs(N + T - 1, T, D)

    def poly_accum(xe):
        x2 = jnp.stack([xe.re, xe.im], axis=0)
        need = (Mv + P - 1) * D
        pad = need - x2.shape[-1]
        x2 = jnp.pad(x2, ((0, 0), (0, pad))) if pad > 0 else x2[..., :need]
        frames = x2.reshape(2, Mv + P - 1, D)
        acc = jnp.zeros((2, Mv), jnp.float32)
        for p in range(P):
            w = lax.slice_in_dim(frames, p, p + Mv, axis=-2)
            acc = acc + jnp.einsum("cmd,d->cm", w, h_pad[p])
        return cplx.Complex(acc[0], acc[1])

    if sel("poly_accum"):
        report("poly_accum", _time_fn(jax.jit(poly_accum), x_ext))

    # --- single matvec over (M, P*D) -----------------------------------------
    def poly_matvec(xe):
        x2 = jnp.stack([xe.re, xe.im], axis=0)
        need = (Mv + P - 1) * D
        pad = need - x2.shape[-1]
        x2 = jnp.pad(x2, ((0, 0), (0, pad))) if pad > 0 else x2[..., :need]
        frames = x2.reshape(2, Mv + P - 1, D)
        wins = jnp.stack(
            [lax.slice_in_dim(frames, p, p + Mv, axis=-2) for p in range(P)], axis=-2
        )  # (2, M, P, D)
        return cplx.Complex(
            *jnp.einsum(
                "cmk,k->cm",
                wins.reshape(2, Mv, P * D),
                h_pad.reshape(-1),
                preferred_element_type=jnp.float32,
            )
        )

    if sel("poly_matvec"):
        report("poly_matvec", _time_fn(jax.jit(poly_matvec), x_ext))

    # --- XLA conv, stride D ---------------------------------------------------
    def conv(xe):
        lhs = jnp.stack([xe.re, xe.im], axis=0)[:, None, :]  # (2,1,L)
        rhs = jnp.flip(h)[None, None, :]
        y = lax.conv_general_dilated(
            lhs, rhs, (D,), "VALID", dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )
        return cplx.Complex(y[0, 0], y[1, 0])

    if sel("conv"):
        report("conv", _time_fn(jax.jit(conv), x_ext))

    # --- conv in polyphase form: D as feature dim (MXU path) ------------------
    def conv_mxu(xe):
        x2 = jnp.stack([xe.re, xe.im], axis=0)
        need = (Mv + P - 1) * D
        pad = need - x2.shape[-1]
        x2 = jnp.pad(x2, ((0, 0), (0, pad))) if pad > 0 else x2[..., :need]
        frames = x2.reshape(2, Mv + P - 1, D).transpose(0, 2, 1)  # (2, D, F)
        rhs = h_pad.T[None]  # (1, D, P): out_ch=1, in_ch=D, width=P
        y = lax.conv_general_dilated(
            frames, rhs, (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )  # (2, 1, F-P+1) = (2,1,Mv)
        return cplx.Complex(y[0, 0], y[1, 0])

    if sel("conv_mxu"):
        report("conv_mxu", _time_fn(jax.jit(conv_mxu), x_ext))

    # --- fft path --------------------------------------------------------------
    if sel("fft"):
        f_fft = jax.jit(lambda xe: fir.fir_extended(xe, h, D, "fft"))
        try:
            report("fft", _time_fn(f_fft, x_ext))
        except Exception as e:  # long-DFT memory blowup etc.
            report("fft", f"error: {e}")

    # --- two-stage decimation ---------------------------------------------------
    # stage 1: D=10, protect [0, 100k] from aliases -> stopband at 2M - 100k
    h1 = design.lowpass_taps(fs, 100e3, 2e6 - 2 * 100e3, -60.0)
    # stage 2: D=5 at 2 Msps, full sharpness
    h2 = design.lowpass_taps(fs / 10, 100e3, 100e3, -60.0)
    print(json.dumps({"two_stage_taps": [len(h1), len(h2)]}))
    h1j, h2j = jnp.asarray(h1, jnp.float32), jnp.asarray(h2, jnp.float32)

    def two_stage(xe):
        y1 = fir.fir_extended(xe, h1j, 10, "poly")
        return fir.fir_extended(y1, h2j, 5, "poly")

    if sel("two_stage"):
        report("two_stage", _time_fn(jax.jit(two_stage), x_ext))


if __name__ == "__main__":
    main()

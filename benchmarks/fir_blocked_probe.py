"""Probe: blocked multi-output polyphase FIR.

Rows of W = k*D input samples produce k outputs each:
    y[q*k + j] = sum_p sum_c H[p, c, j] * X2[q + p, c]
with H[p, c, j] = b[p*W + c - j*D] (b = reversed taps, zero outside [0,T)).
Each of P_w = ceil((T + (k-1)*D) / W) passes is a (R, W) @ (W, k) matmul —
wide minor axis (lane-friendly), MXU-eligible contraction.

Traffic per input ~ P_w * pad128(W)/W vs ceil(T/D) * 128/D for the W=D
accumulation form: ~9x less at T=546/D=50, k=10.

RESULT (v5e, 2026-08-18): negative.  The accumulation form measured
0.19 ms/4M tick while k=8/k=10 measured 1.2-3.2 ms (and this H
construction has an unresolved indexing bug, max_err 0.24).  The padded-
traffic model overestimates the accumulation form's cost — XLA evidently
keeps the (frames, D) minor axis packed inside the fused reduce.  Kept as
a record; do not integrate.

Run: for k in 4 8 10 16 accum; do
       timeout 560 python benchmarks/fir_blocked_probe.py $k >> /tmp/fbp.log 2>&1
     done
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, D, N = 546, 50, 1 << 22
K1, K2 = 4, 12


def main() -> None:
    sel = sys.argv[1]

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpusdr.ops import cplx, fir
    from tpusdr.utils.numerics import cdiv

    rng = np.random.default_rng(0)
    taps = rng.standard_normal(T).astype(np.float32)
    h = jnp.asarray(taps)
    M = N // D

    if sel == "accum":
        def core(x2):
            return fir.fir_extended(cplx.Complex(x2[0], x2[1]), h, D, "poly")

        def as_pair(y):
            return y
    else:
        k = int(sel)
        W = k * D
        Pw = cdiv(T + (k - 1) * D, W)
        R = cdiv(M, k)
        b = taps[::-1]  # y[m] = sum_t b[t] x_ext[m*D + t]
        H = np.zeros((Pw, W, k), np.float32)
        for p in range(Pw):
            for j in range(k):
                for c in range(W):
                    t = p * W + c - j * D
                    if 0 <= t < T:
                        H[p, c, j] = b[t]
        Hj = jnp.asarray(H)

        def core(x2):
            # x2: (2, L) with L = T-1 + M*D
            need = (R + Pw - 1) * W
            pad = need - x2.shape[-1]
            x2 = jnp.pad(x2, ((0, 0), (0, pad))) if pad > 0 else x2[..., :need]
            X2 = x2.reshape(2, R + Pw - 1, W)
            acc = jnp.zeros((2, R, k), jnp.float32)
            for p in range(Pw):
                sl = lax.slice_in_dim(X2, p, p + R, axis=-2)  # (2, R, W)
                acc = acc + jnp.einsum(
                    "crw,wk->crk", sl, Hj[p], preferred_element_type=jnp.float32
                )
            y = acc.reshape(2, R * k)[:, :M]
            return cplx.Complex(y[0], y[1])

    xs = cplx.Complex(
        jnp.asarray(rng.standard_normal((K2, N)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((K2, N)).astype(np.float32)),
    )
    state0 = cplx.zeros((T - 1,))

    def step(state, x):
        ext = cplx.concat([state, x], axis=-1)
        x2 = jnp.stack([ext.re, ext.im], axis=0)
        y = core(x2)
        return ext[..., ext.shape[-1] - (T - 1):], y

    @jax.jit
    def run(state, xs):
        return lax.scan(step, state, xs)

    def timed(kk):
        s, ys = run(state0, jax.tree.map(lambda a: a[:kk], xs))
        jax.block_until_ready(ys)
        t0 = time.perf_counter()
        s, ys = run(state0, jax.tree.map(lambda a: a[:kk], xs))
        jax.block_until_ready(ys)
        return time.perf_counter() - t0

    # correctness vs reference accum path first
    ext = cplx.concat([state0, jax.tree.map(lambda a: a[0], xs)], axis=-1)
    x2 = jnp.stack([ext.re, ext.im], axis=0)
    got = core(x2)
    want = fir.fir_extended(cplx.Complex(x2[0], x2[1]), h, D, "poly")
    err = float(
        max(
            jnp.max(jnp.abs(got.re - want.re)),
            jnp.max(jnp.abs(got.im - want.im)),
        )
    )

    t1 = min(timed(K1), timed(K1), timed(K1))
    t2 = min(timed(K2), timed(K2), timed(K2))
    per = (t2 - t1) / (K2 - K1)
    print(
        json.dumps(
            {
                "variant": sel,
                "per_tick_ms": round(per * 1e3, 3),
                "msps_in": round(N / per / 1e6, 1),
                "max_err": err,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

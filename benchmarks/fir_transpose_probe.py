"""Probe: transposed-polyphase FIR (lane axis = decimated time) vs the
frame-major accumulation, at small decimation factors where (M, D) frames
waste TPU lanes (D < 128).

y[m] = sum_d sum_p h_pad[p,d] * x_d[m+p]   with  x_d[n] = x[n*D + d]:
after one (..., F, D) -> (..., D, F) transpose every slice-mult-reduce runs
with a >= 8-sublane x 128-lane dense layout regardless of D.

Run: for v in frames33_10 transp33_10 frames55_5 transp55_5; do
       timeout 560 python benchmarks/fir_transpose_probe.py $v >> /tmp/ftp.log 2>&1
     done
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    variant = sys.argv[1]
    layout, spec = variant[:6], variant[6:]
    T, D = {"33_10": (33, 10), "55_5": (55, 5)}[spec]
    N = 1 << 22 if D == 10 else 1 << 19  # in-chain rates

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpusdr.ops import cplx
    from tpusdr.utils.numerics import cdiv

    P = cdiv(T, D)
    M = N // D
    rng = np.random.default_rng(0)
    taps = rng.standard_normal(T).astype(np.float32)
    h_pad = (
        jnp.zeros((P * D,), jnp.float32)
        .at[:T]
        .set(jnp.flip(jnp.asarray(taps)))
        .reshape(P, D)
    )

    K1, K2 = 4, 12
    xs = cplx.Complex(
        jnp.asarray(rng.standard_normal((K2, N)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((K2, N)).astype(np.float32)),
    )
    state0 = cplx.zeros((T - 1,))

    def core_frames(x2):
        need = (M + P - 1) * D
        pad = need - x2.shape[-1]
        x2 = jnp.pad(x2, ((0, 0), (0, pad))) if pad > 0 else x2[..., :need]
        frames = x2.reshape(2, M + P - 1, D)
        acc = jnp.zeros((2, M), jnp.float32)
        for p in range(P):
            w = lax.slice_in_dim(frames, p, p + M, axis=-2)
            acc = acc + jnp.einsum("cmd,d->cm", w, h_pad[p])
        return acc

    def core_transp(x2):
        need = (M + P - 1) * D
        pad = need - x2.shape[-1]
        x2 = jnp.pad(x2, ((0, 0), (0, pad))) if pad > 0 else x2[..., :need]
        xT = jnp.moveaxis(x2.reshape(2, M + P - 1, D), -1, -2)  # (2, D, F)
        acc = jnp.zeros((2, M), jnp.float32)
        for p in range(P):
            w = lax.slice_in_dim(xT, p, p + M, axis=-1)  # (2, D, M)
            acc = acc + jnp.einsum("cdm,d->cm", w, h_pad[p])
        return acc

    def core_transb(x2):
        need = (M + P - 1) * D
        pad = need - x2.shape[-1]
        x2 = jnp.pad(x2, ((0, 0), (0, pad))) if pad > 0 else x2[..., :need]
        xT = jnp.moveaxis(x2.reshape(2, M + P - 1, D), -1, -2)
        xT = lax.optimization_barrier(xT)  # force one materialized relayout
        acc = jnp.zeros((2, M), jnp.float32)
        for p in range(P):
            w = lax.slice_in_dim(xT, p, p + M, axis=-1)
            acc = acc + jnp.einsum("cdm,d->cm", w, h_pad[p])
        return acc

    core = {"frames": core_frames, "transp": core_transp, "transb": core_transb}[
        layout
    ]

    def step(state, x):
        ext = cplx.concat([state, x], axis=-1)
        x2 = jnp.stack([ext.re, ext.im], axis=0)
        y = core(x2)
        return ext[..., ext.shape[-1] - (T - 1):], cplx.Complex(y[0], y[1])

    @jax.jit
    def run(state, xs):
        return lax.scan(step, state, xs)

    def timed(k):
        s, ys = run(state0, jax.tree.map(lambda a: a[:k], xs))
        jax.block_until_ready(ys)
        t0 = time.perf_counter()
        s, ys = run(state0, jax.tree.map(lambda a: a[:k], xs))
        jax.block_until_ready(ys)
        return time.perf_counter() - t0

    t1 = min(timed(K1), timed(K1), timed(K1))
    t2 = min(timed(K2), timed(K2), timed(K2))
    per = (t2 - t1) / (K2 - K1)
    print(
        json.dumps(
            {
                "variant": variant,
                "T": T,
                "D": D,
                "n": N,
                "per_tick_ms": round(per * 1e3, 3),
                "msps_in": round(N / per / 1e6, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

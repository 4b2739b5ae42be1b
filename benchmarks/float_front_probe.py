"""Probe: float32 interleaved IQ front-end variants on the TPU.

The int8/int16 wire formats ride packed words (int8_front_probe.py: 5.1x);
float32 pairs have no wider word on this backend (no f64/i64), so the
deinterleave must happen on device.  Candidates for
"interleaved f32 IQ (2N,) -> two f32 planes (N,)":

  A. reshape (N, 2) -> slice [...,0]/[...,1]   (r2 convert.py form — the
     2-wide minor axis that cost the int8 path 13x)
  B. flat strided slice x[0::2], x[1::2]       (no 2-wide minor axis;
     Mosaic lane shuffles)
  C. 2-D staging: reshape (R, 1024) -> strided slice within lanes
     [..., 0::2] -> (R, 512) -> flatten
  D. baseline: f32 (2N,) -> *2.0 (pure HBM streaming bound)

Each candidate is validated bit-exactly vs numpy before timing.

Run: nohup timeout 1750 python benchmarks/float_front_probe.py > /tmp/float_probe.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = 1 << 23  # f32 scalars per tick (32 MiB)
    K1, K2 = 8, 40
    rng = np.random.default_rng(0)
    xf = rng.standard_normal(N).astype(np.float32)
    ref_i, ref_q = xf[0::2], xf[1::2]

    def var_a(x):  # reshape-pairs (the known 2-wide-minor-axis trap)
        p = x.reshape(-1, 2)
        return p[..., 0], p[..., 1]

    def var_b(x):  # flat strided slice
        return x[0::2], x[1::2]

    def var_c(x):  # 2-D staging: stride within 1024-lane rows
        r = x.reshape(-1, 1024)
        return r[:, 0::2].reshape(-1), r[:, 1::2].reshape(-1)

    def base_f32(x):
        return (x * np.float32(2.0),)

    inputs = {
        "A_reshape_pairs": (var_a, xf),
        "B_strided_flat": (var_b, xf),
        "C_strided_2d": (var_c, xf),
        "D_f32_stream": (base_f32, xf),
    }

    for name in ("A_reshape_pairs", "B_strided_flat", "C_strided_2d"):
        fn, arr = inputs[name]
        i, q = jax.jit(fn)(jnp.asarray(arr))
        np.testing.assert_array_equal(np.asarray(i), ref_i, err_msg=name)
        np.testing.assert_array_equal(np.asarray(q), ref_q, err_msg=name)
    print(json.dumps({"validated": True, "n_scalars": N}), flush=True)

    for name, (fn, arr) in inputs.items():
        xs = jnp.asarray(np.stack([arr] * K2))

        @jax.jit
        def run(c, xs, fn=fn):
            def step(c, x):
                outs = fn(x)
                return c + outs[0][..., 0], outs

            return lax.scan(step, c, xs)

        def timed(k):
            c, ys = run(jnp.float32(0), xs[:k])
            np.asarray(jax.tree_util.tree_leaves(ys)[0][(0, 0)])
            t0 = time.perf_counter()
            c, ys = run(jnp.float32(0), xs[:k])
            np.asarray(jax.tree_util.tree_leaves(ys)[0][(0, 0)])
            return time.perf_counter() - t0

        t1 = min(timed(K1) for _ in range(3))
        t2 = min(timed(K2) for _ in range(3))
        per = (t2 - t1) / (K2 - K1)
        print(
            json.dumps(
                {
                    "variant": name,
                    "per_tick_ms": round(per * 1e3, 3),
                    "gsps_f32_scalars": round(N / per / 1e9, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

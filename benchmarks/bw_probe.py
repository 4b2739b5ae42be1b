"""True HBM bandwidth probe: chained elementwise op on a 256 MB array,
slope between two iteration counts removes any fixed dispatch/ack floor.

Run: nohup timeout 560 python benchmarks/bw_probe.py > /tmp/bw.log 2>&1 &
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

    N = 1 << 26  # 64M f32 = 256 MB
    x = jax.device_put(np.ones(N, np.float32))
    f = jax.jit(lambda v: v * 1.0000001 + 1e-12)

    def run(iters):
        y = f(x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            y = f(y)
        jax.block_until_ready(y)
        return time.perf_counter() - t0

    t8, t32 = run(8), run(32)
    per_op = (t32 - t8) / 24.0
    print(
        json.dumps(
            {
                "op": "mul_add_64M_slope",
                "t8_ms": round(t8 * 1e3, 3),
                "t32_ms": round(t32 * 1e3, 3),
                "per_op_ms": round(per_op * 1e3, 4),
                "GBps": round(2 * 4 * N / per_op / 1e9, 1),
            }
        ),
        flush=True,
    )

    # value check: does chained work actually happen?
    y = f(x)
    for _ in range(7):
        y = f(y)
    v = float(np.asarray(y[0]))
    print(json.dumps({"value_after_8": v, "expect": (1.0000001**8)}), flush=True)

    # matmul slope: 8192^3 bf16 = 1.1 TFLOP per op
    K = 8192
    a = jax.device_put(np.random.default_rng(1).standard_normal((K, K)).astype(np.float32) * 1e-2)
    fm = jax.jit(
        lambda u: (
            jnp.dot(u.astype(jnp.bfloat16), u.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * jnp.float32(1e-4)
        )
    )

    def runm(iters):
        y = fm(a)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fm(y)
        jax.block_until_ready(y)
        return time.perf_counter() - t0

    t2, t10 = runm(2), runm(10)
    per = (t10 - t2) / 8.0
    print(
        json.dumps(
            {
                "op": "matmul_8192_bf16_slope",
                "per_op_ms": round(per * 1e3, 3),
                "TFLOPs": round(2 * K**3 / per / 1e12, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

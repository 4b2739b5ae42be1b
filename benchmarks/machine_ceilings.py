"""Practical ceilings of this TPU through the tunnel: elementwise HBM
bandwidth, 1-D vs 2-D layout effects, and MXU matmul rate.  Calibrates how
far the DSP kernels are from speed-of-light on THIS device (v5e nominal:
~819 GB/s HBM, ~197 bf16 TFLOP/s).

Run: nohup timeout 560 python benchmarks/machine_ceilings.py > /tmp/ceil.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _t(fn, x, k1=10, k2=50, reps=3):
    """Chained marginal timing: each iteration consumes the previous output
    (shape-preserving fns only) so the device cannot elide executions; the
    k2-k1 slope cancels dispatch + the host-fetch sync.  block_until_ready
    can return early on the axon backend (CLAUDE.md) — only a host transfer
    reliably joins the stream, and its cost is identical at both chain
    lengths, so it drops out of the slope."""
    import jax

    def chain_time(k):
        y = fn(x)
        np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0])
        t0 = time.perf_counter()
        y = fn(x)
        for _ in range(k - 1):
            y = fn(y)
        np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0])
        return time.perf_counter() - t0

    t1 = min(chain_time(k1) for _ in range(reps))
    t2 = min(chain_time(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1)


def main() -> None:
    import jax
    import jax.numpy as jnp

    N = 1 << 23
    x1 = jax.device_put(np.random.default_rng(0).standard_normal(N).astype(np.float32))
    x2 = jax.device_put(
        np.random.default_rng(0).standard_normal((N // 1024, 1024)).astype(np.float32)
    )

    def report(name, dt, bytes_moved=None, flops=None):
        rec = {"op": name, "ms": round(dt * 1e3, 3)}
        if bytes_moved:
            rec["GBps"] = round(bytes_moved / dt / 1e9, 1)
        if flops:
            rec["TFLOPs"] = round(flops / dt / 1e12, 2)
        print(json.dumps(rec), flush=True)

    # elementwise 1-D: read 32 MB + write 32 MB
    f = jax.jit(lambda v: v * 2.0 + 1.0)
    report("mul_add_1d_8M", _t(f, x1), bytes_moved=2 * 4 * N)

    # same op on a 2-D layout
    f2 = jax.jit(lambda v: v * 2.0 + 1.0)
    report("mul_add_2d_8Kx1K", _t(f2, x2), bytes_moved=2 * 4 * N)

    # reduction: read 32 MB
    fr = jax.jit(lambda v: v + jnp.sum(v * v))  # keep shape for chaining
    report("dot_self_1d", _t(fr, x1), bytes_moved=3 * 4 * N, flops=2 * N)

    # transcendental: cos on 8M
    fc = jax.jit(jnp.cos)
    report("cos_1d_8M", _t(fc, x1), bytes_moved=2 * 4 * N)

    # uint32 iota + cast (the NCO phase path)
    fi = jax.jit(
        lambda v: (
            v[:1].astype(jnp.uint32) + jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(12345)
        ).astype(jnp.float32)
        * jnp.float32(1e-9)
    )
    report("nco_phase_1d_8M", _t(fi, x1), bytes_moved=4 * N)

    # MXU: 4096^3 bf16 matmul = 137 GFLOP
    a = jax.device_put(
        np.random.default_rng(1).standard_normal((4096, 4096)).astype(np.float32)
    )
    fm = jax.jit(
        lambda u: jnp.dot(
            u.astype(jnp.bfloat16), u.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        * jnp.float32(1e-4)
    )
    report("matmul_4096_bf16", _t(fm, a), flops=2 * 4096**3)

    # MXU f32: same contraction with float32 inputs (6-pass emulation)
    fm32 = jax.jit(lambda u: jnp.dot(u, u, preferred_element_type=jnp.float32))
    report("matmul_4096_f32", _t(fm32, a), flops=2 * 4096**3)


if __name__ == "__main__":
    main()

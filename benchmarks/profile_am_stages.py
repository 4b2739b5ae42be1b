"""Per-stage scan-marginal timing of the AM int8 chain (BASELINE config 2).

BENCH_configs_r02: the AM chain measured 330 Mcsps while the WBFM chain
(similar MXU MACs/input at its RF stage) measured 4478 Msps — this probe
finds which stage eats the difference.

Run: nohup timeout 900 python benchmarks/profile_am_stages.py > /tmp/am_stages.log 2>&1 &
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

    from tpusdr.models import receiver
    from tpusdr.ops import cplx

    chain, spec = receiver.am_receiver(10e6, 1.25e6, input_format="int8")
    tick = chain.granule * max(1, (1 << 21) // chain.granule)
    K1, K2 = 8, 40
    rng = np.random.default_rng(0)

    def scan_slope(blk, n_in):
        if blk.in_dtype == jnp.complex64:
            xs = cplx.Complex(
                jnp.asarray(rng.standard_normal((K2, n_in)).astype(np.float32)),
                jnp.asarray(rng.standard_normal((K2, n_in)).astype(np.float32)),
            )
        elif blk.in_dtype in (jnp.int8, jnp.int16, jnp.int32):
            # integer front ends take packed IQ words (blocks.IqToComplex):
            # synthesize int8 wire bytes and view
            width = jnp.dtype(blk.in_dtype).itemsize
            xs = jnp.asarray(
                rng.integers(
                    -128, 128, size=(K2, n_in * width), dtype=np.int8
                ).view(np.dtype(blk.in_dtype).name)
            )
        else:
            xs = jnp.asarray(rng.standard_normal((K2, n_in)).astype(np.float32))

        @jax.jit
        def run(state, xs):
            return lax.scan(blk.apply, state, xs)

        def timed(k):
            s, ys = run(blk.init_state(), jax.tree.map(lambda a: a[:k], xs))
            leaf = jax.tree_util.tree_leaves(ys)[0]
            np.asarray(leaf[(0,) * leaf.ndim])  # host fetch = real sync (CLAUDE.md)
            t0 = time.perf_counter()
            s, ys = run(blk.init_state(), jax.tree.map(lambda a: a[:k], xs))
            leaf = jax.tree_util.tree_leaves(ys)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            return time.perf_counter() - t0

        t1 = min(timed(K1) for _ in range(3))
        t2 = min(timed(K2) for _ in range(3))
        return (t2 - t1) / (K2 - K1)

    n = tick
    for name, blk in chain.blocks:
        per = scan_slope(blk, n)
        print(
            json.dumps(
                {
                    "stage": name,
                    "n_in": n,
                    "per_tick_ms": round(per * 1e3, 3),
                    "msps_in": round(n / per / 1e6, 1),
                }
            ),
            flush=True,
        )
        n = (n * blk.up) // blk.down


if __name__ == "__main__":
    main()

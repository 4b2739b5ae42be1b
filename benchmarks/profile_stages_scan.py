"""Scan-marginal per-stage timing of the headline WBFM chain.

Each stage runs under lax.scan over K carried ticks; the slope between
K=4 and K=12 is the true marginal per-tick cost, immune to the ~40 ms
per-dispatch tunnel overhead (benchmarks/bw_probe.py).

Run: nohup timeout 560 python benchmarks/profile_stages_scan.py [stage...] \
       > /tmp/profscan.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    want = set(sys.argv[1:])

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpusdr.models import receiver
    from tpusdr.ops import cplx

    fs = 20.0e6
    chain, spec = receiver.fm_receiver(
        rf_sample_rate=fs, freq_offset=2.5e6, variant=receiver.WBFM
    )
    tick = chain.granule * max(1, (1 << 22) // chain.granule)
    K1, K2 = 4, 12
    rng = np.random.default_rng(0)

    def scan_slope(blk, n_in, complex_in):
        if complex_in:
            xs = cplx.Complex(
                jnp.asarray(rng.standard_normal((K2, n_in)).astype(np.float32)),
                jnp.asarray(rng.standard_normal((K2, n_in)).astype(np.float32)),
            )
        else:
            xs = jnp.asarray(rng.standard_normal((K2, n_in)).astype(np.float32))

        @jax.jit
        def run(state, xs):
            return lax.scan(blk.apply, state, xs)

        def timed(k):
            s, ys = run(blk.init_state(), jax.tree.map(lambda a: a[:k], xs))
            jax.block_until_ready(ys)
            t0 = time.perf_counter()
            s, ys = run(blk.init_state(), jax.tree.map(lambda a: a[:k], xs))
            jax.block_until_ready(ys)
            return time.perf_counter() - t0

        t1 = min(timed(K1), timed(K1), timed(K1))
        t2 = min(timed(K2), timed(K2), timed(K2))
        return (t2 - t1) / (K2 - K1)

    n = tick
    for name, blk in chain.blocks:
        if want and name not in want:
            n = (n * blk.up) // blk.down
            continue
        complex_in = blk.in_dtype == jnp.complex64
        per = scan_slope(blk, n, complex_in)
        print(
            json.dumps(
                {
                    "stage": name,
                    "n_in": n,
                    "per_tick_ms": round(per * 1e3, 3),
                    "msps_in": round(n / per / 1e6, 1),
                    "chain_ms_equiv": round(per * 1e3, 3),
                }
            ),
            flush=True,
        )
        n = (n * blk.up) // blk.down


if __name__ == "__main__":
    main()

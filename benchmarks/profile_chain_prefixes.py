"""Cumulative-prefix profile of a config chain: scan [s0], [s0,s1], ... and
report the marginal cost each stage adds IN COMPOSITION.

profile_config_stages times each stage alone; config 4 (r3) measured a
whole-chain per-tick ~2x the stage sum, so the gap lives in how XLA
schedules the composed program.  Prefix deltas attribute it.

Usage:
  nohup timeout 1750 python benchmarks/profile_chain_prefixes.py --config 4 \
      > /tmp/prefix4.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(config: int):
    from tpusdr.models import multichannel, receiver

    if config == 2:
        chain, _ = receiver.am_receiver(10e6, 1.25e6, input_format="int8")
    elif config == 3:
        chain, _ = receiver.fm_receiver(20e6, 2.5e6, receiver.WBFM, 48000.0)
    elif config == 4:
        chain, _ = multichannel.fm_channel_bank(20.48e6, 64, 16000.0)
    else:
        raise SystemExit(f"no prefix profile for config {config}")
    return chain


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=4)
    ap.add_argument("--k1", type=int, default=8)
    ap.add_argument("--k2", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpusdr.graph.chain import Chain
    from tpusdr.ops import cplx

    full = build(args.config)
    tick = full.granule * max(1, (1 << 21) // full.granule)
    K1, K2 = args.k1, args.k2
    rng = np.random.default_rng(0)

    # one input upload, tiled on device (tunnel upload is minutes/GB)
    rep = -(-K2 // 4)  # ceil: a K2 not divisible by 4 must still cover K2 ticks
    if full.blocks[0][1].in_dtype == jnp.complex64:
        base = cplx.Complex(
            jax.device_put(rng.standard_normal((4, tick)).astype(np.float32)),
            jax.device_put(rng.standard_normal((4, tick)).astype(np.float32)),
        )
        xs = jax.tree.map(
            lambda a: jax.jit(lambda v: jnp.tile(v, (rep, 1)))(a)[:K2], base
        )
    else:
        b = rng.integers(-128, 128, size=(4, 2 * tick), dtype=np.int8).view(np.int16)
        xs = jax.jit(lambda v: jnp.tile(v, (rep, 1)))(jax.device_put(b))[:K2]

    prev = 0.0
    for n in range(1, len(full.blocks) + 1):
        prefix = Chain(full.blocks[:n])

        @jax.jit
        def run(state, xs, prefix=prefix):
            return lax.scan(prefix.apply, state, xs)

        def timed(k):
            s, ys = run(prefix.init_state(), jax.tree.map(lambda a: a[:k], xs))
            leaf = jax.tree_util.tree_leaves(ys)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            t0 = time.perf_counter()
            s, ys = run(prefix.init_state(), jax.tree.map(lambda a: a[:k], xs))
            leaf = jax.tree_util.tree_leaves(ys)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            return time.perf_counter() - t0

        t1 = min(timed(K1) for _ in range(3))
        t2 = min(timed(K2) for _ in range(3))
        per = (t2 - t1) / (K2 - K1)
        print(
            json.dumps(
                {
                    "config": args.config,
                    "prefix_through": full.blocks[n - 1][0],
                    "per_tick_ms": round(per * 1e3, 3),
                    "delta_ms": round((per - prev) * 1e3, 3),
                    "msps_in": round(tick / per / 1e6, 1),
                }
            ),
            flush=True,
        )
        prev = per


if __name__ == "__main__":
    main()

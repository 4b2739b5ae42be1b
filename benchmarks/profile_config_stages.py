"""Per-stage scan-marginal timing of any BASELINE config chain.

Generalizes profile_am_stages.py (the r3 probe that found the int8
front-end bottleneck) to all measured chains: each stage of the chain is
scanned alone at its own input rate and the marginal per-tick cost
reported — the framework's answer to "which stage eats the budget".

Usage:
  nohup timeout 1750 python benchmarks/profile_config_stages.py --config 4 \
      > /tmp/stages4.log 2>&1 &
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
        raise SystemExit(f"no stage profile for config {config}")
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

    from tpusdr.ops import cplx

    chain = build(args.config)
    tick = chain.granule * max(1, (1 << 21) // chain.granule)
    K1, K2 = args.k1, args.k2
    rng = np.random.default_rng(0)

    def scan_slope(blk, shape):
        if blk.in_dtype == jnp.complex64:
            xs = cplx.Complex(
                jnp.asarray(rng.standard_normal((K2,) + shape).astype(np.float32)),
                jnp.asarray(rng.standard_normal((K2,) + shape).astype(np.float32)),
            )
        elif blk.in_dtype in (jnp.int8, jnp.int16, jnp.int32):
            width = jnp.dtype(blk.in_dtype).itemsize
            n8 = int(np.prod(shape)) * width
            xs = jnp.asarray(
                rng.integers(-128, 128, size=(K2, n8), dtype=np.int8)
                .view(np.dtype(blk.in_dtype).name)
                .reshape((K2,) + shape)
            )
        else:
            xs = jnp.asarray(rng.standard_normal((K2,) + shape).astype(np.float32))

        batch = shape[:-1]

        @jax.jit
        def run(state, xs):
            return lax.scan(blk.apply, state, xs)

        def timed(k):
            s, ys = run(blk.init_state(batch), jax.tree.map(lambda a: a[:k], xs))
            leaf = jax.tree_util.tree_leaves(ys)[0]
            np.asarray(leaf[(0,) * leaf.ndim])  # host fetch = real sync
            t0 = time.perf_counter()
            s, ys = run(blk.init_state(batch), jax.tree.map(lambda a: a[:k], xs))
            leaf = jax.tree_util.tree_leaves(ys)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            return time.perf_counter() - t0

        t1 = min(timed(K1) for _ in range(3))
        t2 = min(timed(K2) for _ in range(3))
        return (t2 - t1) / (K2 - K1)

    shape = (tick,)
    for name, blk in chain.blocks:
        per = scan_slope(blk, shape)
        print(
            json.dumps(
                {
                    "config": args.config,
                    "stage": name,
                    "in_shape": list(shape),
                    "per_tick_ms": round(per * 1e3, 3),
                    "msps_in": round(int(np.prod(shape)) / per / 1e6, 1),
                }
            ),
            flush=True,
        )
        n_out = blk.out_len(shape[-1])
        if blk.adds_channel_axis:
            shape = shape[:-1] + (blk.num_channels, n_out)
        else:
            shape = shape[:-1] + (n_out,)


if __name__ == "__main__":
    main()

"""Per-stage timing of the headline WBFM chain (bench.py config) on TPU.

Times each block of the fs=20 Msps WBFM receiver in isolation at its
in-chain block size, plus the whole chain, so perf work targets the stage
that actually dominates.  Run on hardware:

    nohup timeout 560 python benchmarks/profile_stages.py > /tmp/prof.log 2>&1 &

Prints one JSON line per stage: {"stage": name, "ms": t, "msps_in": rate}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rand_pair(n, rng):
    from tpusdr.ops import cplx

    z = (rng.standard_normal(n) + 1j * 0.5 * rng.standard_normal(n)).astype(
        np.complex64
    )
    return cplx.from_numpy(z)


def _time(step, state, x, iters=8):
    import jax

    s, y = step(state, x)
    jax.block_until_ready(y)
    s, y = step(s, x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, y = step(s, x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax

    from tpusdr.models import receiver
    from tpusdr.ops import cplx

    fs = 20.0e6
    chain, spec = receiver.fm_receiver(
        rf_sample_rate=fs,
        freq_offset=2.5e6,
        variant=receiver.WBFM,
        audio_rate=48000.0,
    )
    tick = chain.granule * max(1, (1 << 23) // chain.granule)
    print(json.dumps({"spec": str(spec), "tick": tick}))

    rng = np.random.default_rng(0)

    # whole chain first
    x = jax.device_put(_rand_pair(tick, rng))
    step = jax.jit(chain.apply, donate_argnums=(0,))
    dt = _time(step, jax.device_put(chain.init_state()), x)
    print(
        json.dumps(
            {"stage": "FULL", "ms": round(dt * 1e3, 3), "msps_in": round(tick / dt / 1e6, 1)}
        )
    )

    # each block at its in-chain input size
    n = tick
    for name, blk in chain.blocks:
        gr_in = getattr(blk, "granule", 1)
        n_in = n
        if blk.in_dtype == jax.numpy.complex64 or name in ("shift", "rf_fir"):
            xb = _rand_pair(n_in, rng)
        else:
            xb = np.asarray(rng.standard_normal(n_in), np.float32)
        xb = jax.device_put(xb)
        stepb = jax.jit(blk.apply, donate_argnums=(0,))
        dtb = _time(stepb, jax.device_put(blk.init_state()), xb)
        print(
            json.dumps(
                {
                    "stage": name,
                    "n_in": n_in,
                    "ms": round(dtb * 1e3, 3),
                    "msps_in": round(n_in / dtb / 1e6, 1),
                }
            )
        )
        n = (n * blk.up) // blk.down


if __name__ == "__main__":
    main()

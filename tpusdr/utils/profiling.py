"""Profiling and timing utilities.

The reference has no profiling at all (SURVEY.md section 5: "no timers, no
NVTX, no counters").  Here:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` for
    TensorBoard-compatible device traces of any streaming run;
  * ``time_block(block, x, iters)`` — steady-state throughput of one block
    (used by the stage profiler and perf tests);
  * ``profile_chain(chain, x)`` — per-stage breakdown of a Chain.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import numpy as np

import jax

from tpusdr.graph.chain import Chain
from tpusdr.ops import cplx
from tpusdr.utils.logging import get_logger

log = get_logger("profiling")


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpusdr_trace"):
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", logdir)


def time_block(block, x, iters: int = 10, warmup: int = 2) -> dict:
    """Steady-state samples/s of one Block on the current default device."""
    state = jax.device_put(block.init_state())
    xd = jax.device_put(x)
    step = jax.jit(block.apply, donate_argnums=(0,))
    y = None
    for _ in range(warmup):
        state, y = step(state, xd)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, y = step(state, xd)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    n = x.shape[-1]
    return {
        "seconds_per_tick": dt,
        "msps": n / dt / 1e6,
        "tick": n,
    }


def profile_chain(chain: Chain, x, iters: int = 10) -> list[dict]:
    """Per-stage steady-state timing of a Chain (each stage timed alone with
    representative input shapes derived from the rate plan)."""
    results = []
    results.append({"stage": "<whole chain>", **time_block(chain, x, iters)})
    cur = x
    state = chain.init_state()
    for name, b in chain.blocks:
        r = {"stage": name, **time_block(b, cur, iters)}
        results.append(r)
        state_b, cur = b.apply(b.init_state(), cur)
    return results


def format_profile(rows: list[dict]) -> str:
    lines = [f"{'stage':<16} {'Msps':>10} {'ms/tick':>9} {'tick':>10}"]
    for r in rows:
        lines.append(
            f"{r['stage']:<16} {r['msps']:>10.1f} "
            f"{r['seconds_per_tick'] * 1e3:>9.2f} {r['tick']:>10}"
        )
    return "\n".join(lines)

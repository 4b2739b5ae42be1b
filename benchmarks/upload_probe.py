"""Host->device upload bandwidth through the tunnel, by transfer size.

CLAUDE.md records a 4 GB device_put not finishing in 29 minutes; streaming
ingest uploads a few MB per tick, so what matters is the SMALL-transfer
rate (it bounds StreamRunner's sustained Msps: a 2M-sample int8-word tick
is 4 MB).  Measures device_put wall time (incl. one-element fetch to join
the stream) for 1..64 MB arrays.

Run: nohup timeout 560 python benchmarks/upload_probe.py > /tmp/upload.log 2>&1 &
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

    for mb in (1, 4, 16, 64):
        n = mb << 20
        x = np.random.default_rng(0).integers(-100, 100, n, dtype=np.int8)
        # warm path once (allocator, layout)
        d = jax.device_put(x)
        np.asarray(d[0])
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            d = jax.device_put(x)
            np.asarray(d[0])  # joins the transfer (block_until_ready lies)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(
            json.dumps(
                {
                    "transfer_mb": mb,
                    "median_ms": round(med * 1e3, 1),
                    "MBps": round(mb / med, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Pallas execution-mode policy.

Compiled Mosaic kernels work on this environment's TPU (re-probed
2026-08-18 — an earlier tunnel bug that hung every compiled kernel was
fixed; see benchmarks/pallas_mosaic_probes.py for what Mosaic accepts,
notably: DMA row counts must be sublane (8) multiples or the TPU worker
crashes, and faults only surface on host transfers, not block_until_ready).

Policy:
  * CPU backend: interpret mode (exact semantics, fast enough for tests);
  * TPU backend: compiled (measured 5.2x over the XLA polyphase fallback
    for the T=546/D=50 WBFM RF stage: 0.21 vs 1.09 ms per 4.2 Ms tick);
  * ``TPUSDR_PALLAS=xla`` opts out (falls back to the equivalent XLA ops),
    ``TPUSDR_PALLAS=interpret`` forces interpret anywhere (debug).
    (Legacy ``TPUSDR_PALLAS_COMPILED=0`` also disables compiled mode.)
"""

from __future__ import annotations

import os

import jax


def pallas_mode() -> str:
    """'interpret' | 'compiled' | 'xla' (= use the XLA fallback)."""
    env = os.environ.get("TPUSDR_PALLAS")
    if env in ("xla", "interpret", "compiled"):
        return env
    if jax.default_backend() == "cpu":
        return "interpret"
    if os.environ.get("TPUSDR_PALLAS_COMPILED") == "0":
        return "xla"
    return "compiled"

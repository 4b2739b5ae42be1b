"""Pallas execution-mode policy.

On this dev environment, compiled Pallas kernels hang inside the axon
remote-compile tunnel (even a trivial elementwise kernel; plain XLA programs
compile fine — verified 2026-08-17).  Until the toolchain supports Mosaic,
the policy is:

  * CPU backend: interpret mode (fast enough for tests, exact semantics);
  * TPU backend: fall back to the equivalent XLA ops unless
    ``TPUSDR_PALLAS_COMPILED=1`` explicitly opts in (for pods where Mosaic
    works).

Kernels and their tests stay in-tree and correct; flipping one env var
enables them on hardware with a working Mosaic path.
"""

from __future__ import annotations

import os

import jax


def pallas_mode() -> str:
    """'interpret' | 'compiled' | 'xla' (= use the XLA fallback)."""
    if jax.default_backend() == "cpu":
        return "interpret"
    if os.environ.get("TPUSDR_PALLAS_COMPILED") == "1":
        return "compiled"
    return "xla"

"""Embedding API: build a runnable pipeline from serialized config.

Parity with the reference's C-linkage session entry point
(include/gpusdrpipeline/SdrSession.h:12: ``createSession(uint8_t*, size_t)``
— the embryonic "embed the whole pipeline behind one call" API).  Here the
payload is the JSON app spec (graph/app.py schema).
"""

from __future__ import annotations

from tpusdr.graph.app import App, compile_app


def create_session(data: bytes | str, tick: int = 1 << 20) -> App:
    """Parse a JSON pipeline spec and return a runnable App."""
    if isinstance(data, (bytes, bytearray)):
        data = data.decode("utf-8")
    return compile_app(data, tick=tick)

"""Node-type registry: string name -> Block builder.

Parity with the reference's global factory registry
(/root/reference/src/filters/FilterFactories.cpp:23-150:
registerNodeFactory/createNode under a global lock).  Here it is a plain
module-level dict populated by the @register_block decorator; JSON graph
specs (graph.py) look types up here, exactly as FilterDriverFactory does by
node-type name.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register_block(name: str):
    """Class/function decorator registering a Block builder under ``name``."""

    def deco(builder):
        _REGISTRY[name] = builder
        return builder

    return deco


def get_registry() -> dict[str, Callable]:
    # Populate on first use.
    import tpusdr.graph.blocks  # noqa: F401

    return dict(_REGISTRY)


def create_block(type_name: str, params: dict | None = None):
    """Instantiate a registered block type from keyword params
    (the analog of createNode(name, jsonParameters),
    FilterFactories.cpp:27-42)."""
    reg = get_registry()
    if type_name not in reg:
        raise KeyError(
            f"unknown node type {type_name!r}; registered: {sorted(reg)}"
        )
    return reg[type_name](**(params or {}))

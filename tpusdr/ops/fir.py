"""Decimating FIR filtering: the framework's hottest op.

TPU-native replacement for the reference's Fir filter + external gsdr CUDA
kernels (gsdrFirFF/FC/CC/CF — /root/reference/src/filters/Fir.cpp:220-268).
Streaming semantics mirror Fir.cpp exactly:

  * with A available input samples, T taps and decimation D, the number of
    outputs is (A - (T-1)) // D            (Fir.cpp:141-187)
  * producing M outputs consumes M*D input samples and retains the last
    T-1 samples as history                 (Fir.cpp:271-276)

On TPU the retained history is not a relocatable GPU buffer
(RelocatableResizableBuffer.cpp:79-103) but an explicit carry array of
``T-1`` samples, which doubles as the overlap-save halo under time-block
sharding (SURVEY.md section 5, "long-context analog").

Three execution paths, selectable per call site (``mode``):
  * 'conv'  — jax.lax.conv_general_dilated with window stride D.  XLA picks
              the schedule; good default for short/medium taps.
  * 'poly'  — polyphase frames + einsum: taps zero-padded to P*D, input
              viewed as (frames, D) non-overlapping blocks, output
              y[m] = sum_p X[m+p] . H[p].  Maps onto VPU/MXU reductions with
              no T-fold im2col blowup (duplication factor is T/D).
  * 'fft'   — frequency-domain convolution for long taps (the reference has
              no FFT path at all; this is a capability win).

All paths operate on the last axis and broadcast over leading batch axes
(used by the polyphase channelizer and multi-channel demod banks).

Complex data / real taps (the dominant SDR case, gsdrFirFC) is computed as a
2-channel real problem; complex taps use the 3-multiply split.
"""

from __future__ import annotations

import functools
from typing import Literal

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from tpusdr.ops import cplx
from tpusdr.ops import fft as mmfft
from tpusdr.utils.numerics import cdiv, next_pow2

FirMode = Literal["auto", "conv", "poly", "fft"]

# Tap count above which the FFT path usually wins (tuned on TPU v5e, see
# benchmarks/fir_mode_sweep).
_FFT_THRESHOLD = 256


def num_outputs(available: int, num_taps: int, decimation: int) -> int:
    """Output count for a given number of available samples (Fir.cpp:180-187)."""
    if available < num_taps:
        return 0
    return (available - (num_taps - 1)) // decimation


def history_len(num_taps: int) -> int:
    """Samples of history a streaming FIR must retain (Fir.cpp:274-276)."""
    return num_taps - 1


# ---------------------------------------------------------------------------
# Core: filter an extended block (history already prepended)
# ---------------------------------------------------------------------------


def fir_extended(
    x_ext,
    taps,
    decimation: int = 1,
    mode: FirMode = "auto",
):
    """Valid-mode convolution of ``x_ext`` with ``taps``, decimated by D.

    ``x_ext`` has shape (..., L) with L = (T-1) + M*D for integer M >= 0;
    returns (..., M) where y[..., m] = sum_j taps[j] * x_ext[..., m*D+T-1-j].

    Complex data may be a cplx.Complex pair (device path) or a complex64
    array (CPU test convenience); the return matches the input
    representation.  All device math is real float32.
    """
    T = np.shape(taps)[-1] if not isinstance(taps, cplx.Complex) else taps.shape[-1]
    D = int(decimation)
    L = x_ext.shape[-1]
    M = num_outputs(L, T, D)

    pair_in = cplx.is_pair(x_ext) or cplx.is_pair(taps)
    cplx_x = cplx.is_complex(x_ext)
    cplx_h = cplx.is_complex(taps)

    if M <= 0:
        empty_shape = x_ext.shape[:-1] + (0,)
        if cplx_x or cplx_h:
            out = cplx.zeros(empty_shape)
            return out if pair_in else cplx.maybe_native(out, x_ext)
        return jnp.zeros(empty_shape, dtype=jnp.float32)

    # Trim any unusable tail so every path sees exactly (T-1) + M*D samples.
    usable = (T - 1) + M * D
    x_ext = x_ext[..., :usable]

    if mode == "auto":
        # Cost per *input* sample: direct/poly ~ T/D MACs; FFT ~ O(log)
        # regardless of D.  Decimating filters therefore stay on the
        # polyphase path unless the per-input work is genuinely large.
        if T >= _FFT_THRESHOLD and T // D >= 32:
            mode = "fft"
        else:
            mode = "poly" if D > 1 else "conv"

    if mode == "fft":
        return _fir_fft_dispatch(x_ext, taps, D, M, pair_in)

    impl = _fir_poly if mode == "poly" else _fir_conv

    if not cplx_x and not cplx_h:  # FF
        return impl(jnp.asarray(x_ext), jnp.asarray(taps), D, M)

    proto = x_ext if cplx_x else taps
    xp = cplx.ensure_pair(x_ext) if cplx_x else None
    hp = cplx.ensure_pair(jnp.asarray(taps)) if cplx_h else None

    if cplx_x and not cplx_h:  # FC: filter I and Q as two real channels
        h = jnp.asarray(taps)
        stacked = jnp.stack([xp.re, xp.im], axis=0)
        y = impl(stacked, h, D, M)
        out = cplx.Complex(y[0], y[1])
    elif cplx_x and cplx_h:  # CC: 3-multiply complex convolution
        k1 = impl(xp.re + xp.im, hp.re, D, M)
        k2 = impl(xp.im, hp.re + hp.im, D, M)
        k3 = impl(xp.re, hp.im - hp.re, D, M)
        out = cplx.Complex(k1 - k2, k1 + k3)
    else:  # CF: real input, complex taps -> complex output (gsdrFirCF)
        x = jnp.asarray(x_ext)
        out = cplx.Complex(impl(x, hp.re, D, M), impl(x, hp.im, D, M))
    return out if pair_in else cplx.maybe_native(out, proto)


def _fir_conv(x: jnp.ndarray, taps: jnp.ndarray, D: int, M: int) -> jnp.ndarray:
    """lax.conv_general_dilated path (real-only; caller splits complex)."""
    batch_shape = x.shape[:-1]
    lhs = x.reshape((-1, 1, x.shape[-1])).astype(jnp.float32)
    rhs = jnp.flip(taps).reshape((1, 1, -1)).astype(jnp.float32)
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(D,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(batch_shape + (M,))


def _fir_poly(x: jnp.ndarray, taps: jnp.ndarray, D: int, M: int) -> jnp.ndarray:
    """Polyphase-frame accumulation path (real-only; caller splits complex).

    taps reversed and zero-padded to P*D; x zero-padded to (M+P-1)*D and
    reshaped into non-overlapping (frame, D) blocks; the decimating FIR is
    then y[m] = sum_p frames[m+p] . H[p] — P shifted slices, each reduced
    over D and accumulated.  The P partial products are accumulated in a
    Python loop rather than stacked + einsummed: XLA fuses each
    slice-multiply-reduce-add into one VPU pass over the frames, so the
    (P, ..., M, D) intermediate never exists.  Measured 5x faster than the
    stack+einsum form at T=546/D=50 on v5e (benchmarks/fir_scan_probe.py:
    3970 vs 803 Msps) — the stack materializes a P-fold copy of the signal
    in HBM; the accumulation is a single streaming read.
    """
    T = taps.shape[-1]
    P = cdiv(T, D)
    h_rev = jnp.flip(taps).astype(jnp.float32)
    h_pad = jnp.zeros((P * D,), jnp.float32).at[:T].set(h_rev).reshape(P, D)

    need = (M + P - 1) * D
    pad = need - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    else:
        x = x[..., :need]
    frames = x.reshape(x.shape[:-1] + (M + P - 1, D)).astype(jnp.float32)
    acc = jnp.zeros(x.shape[:-1] + (M,), jnp.float32)
    for p in range(P):
        w = lax.slice_in_dim(frames, p, p + M, axis=-2)
        acc = acc + jnp.einsum("...md,d->...m", w, h_pad[p])
    return acc


def _fir_fft_dispatch(x, taps, D: int, M: int, pair_in: bool):
    """Frequency-domain valid convolution, then decimation.

    Device path (pair inputs): matmul-DFT (ops/fft.py) — no FFT HLO, all
    MXU.  CPU complex64 path: native jnp.fft.  Circular wraparound is safe
    because only outputs in [T-1, L-1] are kept and n_fft >= L.
    """
    T = np.shape(taps)[-1] if not isinstance(taps, cplx.Complex) else taps.shape[-1]
    L = x.shape[-1]
    n_fft = next_pow2(L)

    if pair_in:
        xp = cplx.ensure_pair(x)
        hp = cplx.ensure_pair(taps if isinstance(taps, cplx.Complex) else jnp.asarray(taps))
        pad = [(0, 0)] * (xp.ndim - 1) + [(0, n_fft - L)]
        xp = cplx.Complex(jnp.pad(xp.re, pad), jnp.pad(xp.im, pad))
        hpad = [(0, n_fft - T)]
        hp = cplx.Complex(jnp.pad(hp.re, hpad), jnp.pad(hp.im, hpad))
        Y = mmfft.dft(xp) * mmfft.dft(hp)
        y = mmfft.idft(Y)
        valid = cplx.Complex(
            lax.slice_in_dim(y.re, T - 1, T - 1 + M * D, axis=-1),
            lax.slice_in_dim(y.im, T - 1, T - 1 + M * D, axis=-1),
        )
        return valid[..., ::D] if D > 1 else valid

    complex_io = jnp.iscomplexobj(x) or jnp.iscomplexobj(taps)
    if complex_io:
        X = jnp.fft.fft(x.astype(jnp.complex64), n=n_fft, axis=-1)
        H = jnp.fft.fft(jnp.asarray(taps).astype(jnp.complex64), n=n_fft)
        y = jnp.fft.ifft(X * H, axis=-1)
    else:
        X = jnp.fft.rfft(x.astype(jnp.float32), n=n_fft, axis=-1)
        H = jnp.fft.rfft(jnp.asarray(taps).astype(jnp.float32), n=n_fft)
        y = jnp.fft.irfft(X * H, n=n_fft, axis=-1)
    valid = lax.slice_in_dim(y, T - 1, T - 1 + M * D, axis=-1)
    out = valid[..., ::D] if D > 1 else valid
    if not complex_io:
        return out.astype(jnp.float32)
    return out.astype(jnp.complex64)


# ---------------------------------------------------------------------------
# Streaming interface
# ---------------------------------------------------------------------------


def fir_init_state(taps, dtype, batch_shape=()):
    """Zero history carry of length T-1 (the cold-start state).

    For complex streams pass dtype='pair' (device path) to get a
    cplx.Complex zero pair; jnp.complex64 gives a native array (CPU tests).
    """
    T = np.shape(taps)[-1] if not isinstance(taps, cplx.Complex) else taps.shape[-1]
    shape = tuple(batch_shape) + (history_len(T),)
    if dtype == "pair":
        return cplx.zeros(shape)
    return jnp.zeros(shape, dtype=dtype)


def _concat_last(state, x):
    if cplx.is_pair(x) or cplx.is_pair(state):
        sp, xp = cplx.ensure_pair(state), cplx.ensure_pair(x)
        return cplx.concat([sp, xp], axis=-1)
    return jnp.concatenate([state, x], axis=-1)


def _tail(ext, n):
    start = ext.shape[-1] - n
    if cplx.is_pair(ext):
        return cplx.Complex(
            lax.slice_in_dim(ext.re, start, ext.shape[-1], axis=-1),
            lax.slice_in_dim(ext.im, start, ext.shape[-1], axis=-1),
        )
    return lax.slice_in_dim(ext, start, ext.shape[-1], axis=-1)


def fir_apply(
    state,
    x,
    taps,
    decimation: int = 1,
    mode: FirMode = "auto",
):
    """One streaming step: (history, block) -> (history', outputs).

    ``x.shape[-1]`` must be a multiple of ``decimation`` (the static rate
    planner guarantees this), so exactly len(x)/D outputs are produced and
    the retained history stays at T-1 samples — the invariant that makes
    output independent of how the stream is chopped into blocks
    (generalizing tests/FirTests.cpp:96-221).
    """
    D = int(decimation)
    N = x.shape[-1]
    if N % D != 0:
        raise ValueError(f"block length {N} not divisible by decimation {D}")
    ext = _concat_last(state, x)
    y = fir_extended(ext, taps, D, mode)
    T = np.shape(taps)[-1] if not isinstance(taps, cplx.Complex) else taps.shape[-1]
    return _tail(ext, T - 1), y


def fir_full(
    x,
    taps,
    decimation: int = 1,
    mode: FirMode = "auto",
):
    """Offline whole-signal filter with zero initial history."""
    T = np.shape(taps)[-1] if not isinstance(taps, cplx.Complex) else taps.shape[-1]
    shape = x.shape[:-1] + (history_len(T),)
    state = cplx.zeros(shape) if cplx.is_pair(x) else jnp.zeros(shape, dtype=x.dtype)
    usable = (x.shape[-1] // decimation) * decimation
    _, y = fir_apply(state, x[..., :usable], taps, decimation, mode)
    return y


@functools.partial(jax.jit, static_argnames=("decimation", "mode"))
def fir_apply_jit(state, x, taps, decimation=1, mode="auto"):
    return fir_apply(state, x, taps, decimation, mode)

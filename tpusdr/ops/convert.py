"""Sample-format conversion ops.

TPU-native replacement for Int8ToFloat (/root/reference/src/filters/
Int8ToFloat.cpp:89-94, gsdrInt8ToNormFloat) plus the int16 and interleaved-IQ
variants an SDR front end needs.  All 1:1 stateless elementwise maps — pure
XLA (VPU), fused into whatever consumes them.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from tpusdr.ops.cplx import Complex

# HackRF-style int8 IQ normalizes by 128 (full-scale -128..127 -> ~[-1, 1)).
INT8_SCALE = 1.0 / 128.0
INT16_SCALE = 1.0 / 32768.0


def int8_to_float(x: jnp.ndarray, scale: float = INT8_SCALE) -> jnp.ndarray:
    return x.astype(jnp.float32) * jnp.float32(scale)


def int16_to_float(x: jnp.ndarray, scale: float = INT16_SCALE) -> jnp.ndarray:
    return x.astype(jnp.float32) * jnp.float32(scale)


def float_to_int16(x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.clip(x, -1.0, 1.0) * 32767.0
    return jnp.round(y).astype(jnp.int16)


def interleaved_to_complex(x: jnp.ndarray) -> Complex:
    """[i0, q0, i1, q1, ...] float (..., 2N) -> Complex pair of length N.

    Deinterleaves with flat stride-2 slices: f32 pairs have no wider word
    to pack into on this backend (no f64/i64), so unlike the int formats
    the split must happen on device — and the reshape-to-(N, 2)-and-slice
    form leaves the 2-wide minor axis that TPU tiles to 128 lanes (the
    int8 path's 13x trap, benchmarks/profile_am_stages.py).  Strided
    slices keep every intermediate flat; Mosaic lowers them to lane
    shuffles (benchmarks/float_front_probe.py).  Bit-exact vs the reshape
    form (tests/test_osc_convert.py)."""
    if x.shape[-1] % 2:
        raise ValueError(
            f"interleaved IQ needs an even last axis, got {x.shape[-1]}"
        )
    return Complex(x[..., 0::2], x[..., 1::2])


def complex_to_interleaved(x: Complex) -> jnp.ndarray:
    return jnp.stack([x.re, x.im], axis=-1).reshape(x.re.shape[:-1] + (-1,))


def int8_iq_to_complex(x: jnp.ndarray, scale: float = INT8_SCALE) -> Complex:
    """Interleaved int8 IQ (the HackRF wire format) -> normalized complex
    pair — fuses the reference's CudaMemcpy H2D + Int8ToFloat front end
    (nbfm_test.cpp:447-459) into one elementwise map.

    Deinterleave is done by bitcasting each little-endian (i, q) byte pair
    to one int16 word and splitting it with arithmetic shifts, keeping
    every array flat (..., N): the naive reshape-to-(N, 2)-and-slice form
    leaves a 2-wide minor axis that TPU tiles to 128 lanes — 126/128 of
    every register row wasted, measured 13x slower than the big RF FIR on
    v5e (benchmarks/profile_am_stages.py; same trap as
    benchmarks/fir_transpose_probe.py).  Bit-exact vs the reshape form.

    NOTE: this is the correctness fallback for device-resident int8 arrays.
    On v5e the int8 load + bitcast itself caps at ~1.45 Gsps of int8
    scalars; presenting the same bytes as packed int16 words and splitting
    with ``int8_words_to_complex`` measured 7.47 Gsps
    (benchmarks/int8_front_probe.py, 2026-08-19) — the production front end
    uploads words (see pack_int8_words).
    """
    w = lax.bitcast_convert_type(x.reshape(x.shape[:-1] + (-1, 2)), jnp.int16)
    return int8_words_to_complex(w, scale)


def int16_iq_to_complex(x: jnp.ndarray, scale: float = INT16_SCALE) -> Complex:
    """Interleaved int16 IQ -> complex pair; same flat-bitcast trick as
    int8_iq_to_complex (int16 pair -> int32 word).  Correctness fallback —
    production uploads packed int32 words (int16_words_to_complex)."""
    w = lax.bitcast_convert_type(x.reshape(x.shape[:-1] + (-1, 2)), jnp.int32)
    return int16_words_to_complex(w, scale)


def int8_words_to_complex(w: jnp.ndarray, scale: float = INT8_SCALE) -> Complex:
    """Packed int8 IQ words -> complex pair: ``w`` is int16, one word per
    complex sample, little-endian (i = low byte, q = high byte) — exactly
    the bytes of the int8 interleaved wire format, viewed as int16 on the
    host for free (numpy .view, pack_int8_words).

    This is the fast path: device-resident int8 arrays are sub-word on TPU
    and their load + bitcast measured 1.45 Gsps of int8 scalars on v5e,
    while the identical bytes as int16 words split at 7.47 Gsps — 5.1x
    (benchmarks/int8_front_probe.py, 2026-08-19).  Bit-exact vs the int8
    forms (validated in the probe and tests/test_osc_convert.py).
    """
    i = jnp.right_shift(jnp.left_shift(w, 8), 8)  # low byte, sign-extended
    q = jnp.right_shift(w, 8)  # high byte (arithmetic shift)
    s = jnp.float32(scale)
    return Complex(i.astype(jnp.float32) * s, q.astype(jnp.float32) * s)


def int16_words_to_complex(w: jnp.ndarray, scale: float = INT16_SCALE) -> Complex:
    """Packed int16 IQ words -> complex pair: ``w`` is int32, one word per
    complex sample, little-endian (i = low half, q = high half); the int16
    sibling of int8_words_to_complex (same sub-word-storage reasoning)."""
    i = jnp.right_shift(jnp.left_shift(w, 16), 16)
    q = jnp.right_shift(w, 16)
    s = jnp.float32(scale)
    return Complex(i.astype(jnp.float32) * s, q.astype(jnp.float32) * s)


def pack_int8_words(raw: np.ndarray) -> np.ndarray:
    """Host-side zero-copy view of interleaved int8 IQ as packed int16
    words (one per complex sample) — the upload dtype for the fast front
    end.  Same bytes on the wire and over PCIe; only the device layout tag
    changes."""
    return np.ascontiguousarray(raw).view(np.int16)


def pack_int16_words(raw: np.ndarray) -> np.ndarray:
    """Host-side zero-copy view of interleaved int16 IQ as packed int32
    words (one per complex sample)."""
    return np.ascontiguousarray(raw).view(np.int32)

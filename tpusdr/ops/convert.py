"""Sample-format conversion ops.

TPU-native replacement for Int8ToFloat (/root/reference/src/filters/
Int8ToFloat.cpp:89-94, gsdrInt8ToNormFloat) plus the int16 and interleaved-IQ
variants an SDR front end needs.  All 1:1 stateless elementwise maps — pure
XLA (VPU), fused into whatever consumes them.
"""

from __future__ import annotations

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
    """[i0, q0, i1, q1, ...] float (..., 2N) -> Complex pair of length N."""
    x = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
    return Complex(x[..., 0], x[..., 1])


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
    """
    w = lax.bitcast_convert_type(x.reshape(x.shape[:-1] + (-1, 2)), jnp.int16)
    i = jnp.right_shift(jnp.left_shift(w, 8), 8)  # low byte, sign-extended
    q = jnp.right_shift(w, 8)  # high byte (arithmetic shift)
    s = jnp.float32(scale)
    return Complex(i.astype(jnp.float32) * s, q.astype(jnp.float32) * s)


def int16_iq_to_complex(x: jnp.ndarray, scale: float = INT16_SCALE) -> Complex:
    """Interleaved int16 IQ -> complex pair; same flat-bitcast trick as
    int8_iq_to_complex (int16 pair -> int32 word)."""
    w = lax.bitcast_convert_type(x.reshape(x.shape[:-1] + (-1, 2)), jnp.int32)
    i = jnp.right_shift(jnp.left_shift(w, 16), 16)
    q = jnp.right_shift(w, 16)
    s = jnp.float32(scale)
    return Complex(i.astype(jnp.float32) * s, q.astype(jnp.float32) * s)

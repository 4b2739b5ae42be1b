"""Numerically-controlled oscillators (NCO) for mixing and synthesis.

TPU-native replacement for CosineSource / ComplexCosineSource
(/root/reference/src/filters/CosineSource.cpp:40-90,
ComplexCosineSource.cpp): the reference carries a float phase ``mPhi`` and
wraps it mod 2*pi each block (CosineSource.cpp:72-84), which drifts over long
streams.  Here phase is a **uint32 fixed-point accumulator** (cycles in units
of 2^-32): the per-block phase update is exact integer arithmetic, so the
oscillator is drift-free and its phase at any global sample index is a closed
form — which is what makes it bit-stable when the time axis is sharded across
devices (each shard computes ``phase0 + offset * inc`` with wrap-around
uint32 multiplication).

Per-sample phases within a block are ``phase_u32 + k * inc_u32 (mod 2^32)``
— a VPU iota-mul-add; the cos/sin evaluation is the only transcendental.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tpusdr.ops.cplx import Complex

TWO_PI = 2.0 * np.pi
_PHASE_SCALE = np.float32(TWO_PI / 4294967296.0)  # 2*pi / 2^32


def freq_to_inc_u32(frequency: float, sample_rate: float) -> np.uint32:
    """Quantize a frequency to a uint32 phase increment (cycles * 2^32).

    Resolution is sample_rate / 2^32 (e.g. 4.7 mHz at 20 Msps) — far below
    the reference's float32 phase resolution.
    """
    cycles_per_sample = float(frequency) / float(sample_rate)
    inc = int(round((cycles_per_sample % 1.0) * 4294967296.0)) % 4294967296
    return np.uint32(inc)


def phase_angles(phase_u32: jnp.ndarray, inc_u32, num: int) -> jnp.ndarray:
    """Radian phase angles for ``num`` consecutive samples starting at
    ``phase_u32`` (uint32 scalar array). Returns float32 (num,)."""
    k = jnp.arange(num, dtype=jnp.uint32)
    ph = phase_u32 + k * jnp.uint32(inc_u32)  # wraps mod 2^32 exactly
    return ph.astype(jnp.float32) * _PHASE_SCALE


def advance_phase(phase_u32: jnp.ndarray, inc_u32, num: int) -> jnp.ndarray:
    """Exact phase accumulator update for a block of ``num`` samples."""
    step = np.uint32((int(inc_u32) * int(num)) % 4294967296)
    return phase_u32 + step


def cosine_block(phase_u32, inc_u32, num: int, amplitude: float = 1.0) -> jnp.ndarray:
    """Real cosine block (gsdrCosineF analog, CosineSource.cpp:68-80)."""
    ang = phase_angles(phase_u32, inc_u32, num)
    out = jnp.cos(ang)
    if amplitude != 1.0:
        out = out * jnp.float32(amplitude)
    return out


def complex_cosine_block(
    phase_u32, inc_u32, num: int, amplitude: float = 1.0
) -> Complex:
    """Complex exponential block exp(j*theta) (gsdrCosineC analog), as a
    real pair (no complex dtype on the device path).

    A *negative* frequency (inc computed from -f) yields exp(-j*2*pi*f*t),
    the canonical down-conversion oscillator.
    """
    ang = phase_angles(phase_u32, inc_u32, num)
    out = Complex(jnp.cos(ang), jnp.sin(ang))
    if amplitude != 1.0:
        out = out * jnp.float32(amplitude)
    return out


def init_phase(initial_radians: float = 0.0) -> jnp.ndarray:
    cycles = (initial_radians / TWO_PI) % 1.0
    return jnp.uint32(int(round(cycles * 4294967296.0)) % 4294967296)

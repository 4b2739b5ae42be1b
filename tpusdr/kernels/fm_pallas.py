"""Fused NCO-mix -> decimating FIR -> FM discriminator Pallas kernel.

The reference's precedent is gsdrFmDemod — one CUDA kernel fusing
mix + FIR + decimate + demod (fm_simpletest.cpp:400-414).  Here the fusion
matters for HBM bandwidth: the unfused chain writes the mixed stream and
the filtered stream back to HBM between stages; this kernel reads the raw
IQ once, does everything in VMEM, and writes only the (decimated-by-D)
audio-rate discriminator output.

Per grid program (B outputs):
  1. DMA a (B+P, D) window of decimation frames (re & im) HBM -> VMEM;
  2. NCO phases via uint32 iota arithmetic (exact, drift-free — same
     accumulator as ops/osc.py), cos/sin on the VPU;
  3. complex mix, then the polyphase MAC of fir_pallas (P row-shifted
     multiply-accumulates), lane-reduce -> B+1 filtered samples v[k];
  4. discriminator y[m] = gain * atan2(im, re){ v[m+1] * conj(v[m]) }.

Contract: ext has length (T-1) + (M+1)*D — the streaming carry is the FIR
tail plus one extra decimated step (the reference's QuadFmDemod 1-sample
history, QuadFmDemod.cpp:95-107, at the pre-decimation rate).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusdr.ops import cplx
from tpusdr.utils.numerics import cdiv, round_up

_PHASE_SCALE = np.float32(2.0 * np.pi / 4294967296.0)
_PI = np.float32(np.pi)
_PI_2 = np.float32(np.pi / 2)


_PI_4 = np.float32(np.pi / 4)
_TAN_3PI_8 = np.float32(2.414213562373095)
_TAN_PI_8 = np.float32(0.4142135623730951)


def _atanf(x):
    """Cephes-style float32 atan (Mosaic has no atan primitive): two-step
    range reduction + odd minimax polynomial, ~1e-7 abs error."""
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = ax > _TAN_PI_8
    x1 = jnp.where(
        big,
        jnp.float32(-1.0) / jnp.maximum(ax, 1e-30),
        jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax),
    )
    y0 = jnp.where(big, _PI_2, jnp.where(mid, _PI_4, jnp.float32(0.0)))
    z = x1 * x1
    p = (
        (jnp.float32(8.05374449538e-2) * z - jnp.float32(1.38776856032e-1)) * z
        + jnp.float32(1.99777106478e-1)
    ) * z - jnp.float32(3.33329491539e-1)
    r = y0 + p * z * x1 + x1
    return jnp.where(x < 0, -r, r)


def _atan2(y, x):
    """Quadrant-corrected atan2 from the polynomial atan."""
    x_zero = x == 0
    safe_x = jnp.where(x_zero, jnp.ones_like(x), x)
    base = _atanf(y / safe_x)
    y_sign = jnp.where(y < 0, jnp.float32(-1.0), jnp.float32(1.0))
    corrected = jnp.where(x < 0, base + y_sign * _PI, base)
    on_axis = jnp.where(y == 0, jnp.zeros_like(y), y_sign * _PI_2)
    return jnp.where(x_zero, on_axis, corrected)


def _kernel(
    phase_ref,
    hr_ref,
    hi_ref,
    h_ref,
    out_ref,
    sr,
    si,
    sem_r,
    sem_i,
    *,
    B,
    P,
    D,
    Dp,
    inc,
    gain,
    rows,
):
    # ``rows``: B+P rounded up to 8 — Mosaic DMA row counts must be
    # sublane multiples or the TPU worker crashes
    # (benchmarks/pallas_mosaic_probes.py X1).
    k = pl.program_id(0)
    cp_r = pltpu.make_async_copy(hr_ref.at[pl.ds(k * B, rows), :], sr, sem_r)
    cp_i = pltpu.make_async_copy(hi_ref.at[pl.ds(k * B, rows), :], si, sem_i)
    cp_r.start()
    cp_i.start()

    # NCO phases for this window: sample index = (k*B + row)*D + col.
    # (cols >= D are lane padding over zeroed data; their phases are moot.)
    row_iota = lax.broadcasted_iota(jnp.uint32, (rows, Dp), 0)
    col_iota = lax.broadcasted_iota(jnp.uint32, (rows, Dp), 1)
    base = phase_ref[0, 0] + jnp.uint32((inc * D) % (1 << 32)) * (
        k.astype(jnp.uint32) * jnp.uint32(B)
    )
    ph = base + row_iota * jnp.uint32((inc * D) % (1 << 32)) + col_iota * jnp.uint32(inc)
    # Mosaic has no uint32->f32 cast; reinterpret as int32 (angle lands in
    # [-pi, pi) instead of [0, 2*pi) — identical cos/sin).
    ang = pltpu.bitcast(ph, jnp.int32).astype(jnp.float32) * _PHASE_SCALE
    c = jnp.cos(ang)
    s = jnp.sin(ang)

    cp_r.wait()
    cp_i.wait()
    ur = sr[:] * c - si[:] * s
    ui = sr[:] * s + si[:] * c

    n = B + 1
    acc_r = ur[0:n, :] * h_ref[0:1, :]
    acc_i = ui[0:n, :] * h_ref[0:1, :]
    for p in range(1, P):
        acc_r = acc_r + ur[p : p + n, :] * h_ref[p : p + 1, :]
        acc_i = acc_i + ui[p : p + n, :] * h_ref[p : p + 1, :]
    vr = jnp.sum(acc_r, axis=1)
    vi = jnp.sum(acc_i, axis=1)

    pr = vr[1:] * vr[:-1] + vi[1:] * vi[:-1]
    pi = vi[1:] * vr[:-1] - vr[1:] * vi[:-1]
    out_ref[:] = jnp.float32(gain) * _atan2(pi, pr)


@functools.partial(
    jax.jit,
    static_argnames=("decimation", "inc_u32", "gain", "block_b", "interpret"),
)
def _fused_call(xr, xi, taps, phase0, decimation, inc_u32, gain, block_b, interpret):
    D = decimation
    T = taps.shape[-1]
    P = cdiv(T, D)
    L = xr.shape[-1]
    M = (L - (T - 1)) // D - 1  # one decim-step consumed by the discriminator

    h_rev = jnp.flip(taps).astype(jnp.float32)
    h_poly = jnp.zeros((P * D,), jnp.float32).at[:T].set(h_rev).reshape(P, D)

    B = block_b
    m_pad = round_up(max(M, 1), B)
    dma_rows = round_up(B + P, 8)  # sublane-aligned DMA window
    total_rows = (m_pad - B) + dma_rows
    need = total_rows * D

    # Lane-align the frame width for Mosaic DMA (see fir_pallas).
    Dp = round_up(D, 128)
    h_poly = jnp.zeros((P, Dp), jnp.float32).at[:, :D].set(h_poly)

    def prep(x):
        pad = need - L
        if pad > 0:
            x = jnp.pad(x, (0, pad))
        else:
            x = x[:need]
        f = x.reshape(total_rows, D)
        if Dp != D:
            f = jnp.pad(f, ((0, 0), (0, Dp - D)))
        return f

    fr, fi = prep(xr), prep(xi)
    # SMEM scalars must be 2-D on TPU (pallas guide, pitfall 8)
    phase_arr = jnp.reshape(jnp.asarray(phase0, jnp.uint32), (1, 1))

    y = pl.pallas_call(
        functools.partial(
            _kernel, B=B, P=P, D=D, Dp=Dp, inc=int(inc_u32), gain=float(gain),
            rows=dma_rows,
        ),
        grid=(m_pad // B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # phase0 (1,)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B,), lambda k: (k,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((dma_rows, Dp), jnp.float32),
            pltpu.VMEM((dma_rows, Dp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(phase_arr, fr, fi, h_poly)
    return y[:M]


def fused_fm_demod_pallas(
    x_ext: cplx.Complex,
    taps,
    decimation: int,
    inc_u32,
    phase0_u32,
    gain: float,
    block_b: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused mix+filter+decimate+discriminate.

    ``phase0_u32`` is the NCO phase (uint32 cycles) of ext sample 0; pass
    ``osc.freq_to_inc_u32(-f_offset, fs)`` as ``inc_u32`` to downconvert a
    channel at +f_offset.
    """
    taps = jnp.asarray(taps, jnp.float32)
    phase_arr = jnp.reshape(jnp.asarray(phase0_u32, jnp.uint32), (1, 1))
    return _fused_call(
        x_ext.re,
        x_ext.im,
        taps,
        phase_arr,
        int(decimation),
        int(inc_u32),
        float(gain),
        block_b,
        interpret,
    )

"""Pallas decimating FIR (complex data x real taps — the gsdrFirFC case).

Layout: the signal is viewed as non-overlapping decimation frames
(rows of D samples, row-major so the reshape is free), and the decimating
FIR becomes

    y[m] = sum_p  frames[m+p, :] . h_poly[p, :]

with h_poly the reversed taps zero-padded to P*D and reshaped (P, D).
Each grid program DMAs a (B+P-1, D) window of frames from HBM into VMEM
(one read of the signal, P-1 rows of overlap), multiply-accumulates P
shifted row-blocks against constant tap rows on the VPU, and reduces the
lane axis once.  The XLA 'poly' path materializes the P shifted copies in
HBM (~P x bandwidth); this kernel keeps them in VMEM.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusdr.ops import cplx
from tpusdr.utils.numerics import cdiv, round_up


def _kernel(hr_ref, hi_ref, h_ref, out_r_ref, out_i_ref, sr, si, sem_r, sem_i, *, B, P, D, rows):
    # ``rows`` is B+P-1 rounded up to 8: Mosaic DMAs crash the TPU worker
    # on row counts that aren't sublane (8) multiples (probed 2026-08-18,
    # benchmarks/pallas_mosaic_probes.py); extra rows are zero padding.
    k = pl.program_id(0)
    cp_r = pltpu.make_async_copy(hr_ref.at[pl.ds(k * B, rows), :], sr, sem_r)
    cp_i = pltpu.make_async_copy(hi_ref.at[pl.ds(k * B, rows), :], si, sem_i)
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    # rank-matched (1, Dp) tap rows: Mosaic has no implicit rank expansion
    acc_r = sr[0:B, :] * h_ref[0:1, :]
    acc_i = si[0:B, :] * h_ref[0:1, :]
    for p in range(1, P):
        acc_r = acc_r + sr[p : p + B, :] * h_ref[p : p + 1, :]
        acc_i = acc_i + si[p : p + B, :] * h_ref[p : p + 1, :]
    out_r_ref[:] = jnp.sum(acc_r, axis=1)
    out_i_ref[:] = jnp.sum(acc_i, axis=1)


@functools.partial(
    jax.jit, static_argnames=("decimation", "block_b", "interpret")
)
def _fir_decim_call(xr, xi, taps, decimation, block_b, interpret):
    D = decimation
    T = taps.shape[-1]
    P = cdiv(T, D)
    L = xr.shape[-1]
    M = (L - (T - 1)) // D

    h_rev = jnp.flip(taps).astype(jnp.float32)
    h_poly = jnp.zeros((P * D,), jnp.float32).at[:T].set(h_rev).reshape(P, D)

    B = block_b
    m_pad = round_up(M, B)
    dma_rows = round_up(B + P - 1, 8)  # sublane-aligned DMA window
    total_rows = (m_pad - B) + dma_rows  # last block's window must fit
    need = total_rows * D

    # Mosaic DMA slices need the lane (minor) dim aligned to 128: pad the
    # frame width from D to a 128 multiple (zero lanes meet zero taps).
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

    grid = (m_pad // B,)
    out_shape = (
        jax.ShapeDtypeStruct((m_pad,), jnp.float32),
        jax.ShapeDtypeStruct((m_pad,), jnp.float32),
    )
    yr, yi = pl.pallas_call(
        functools.partial(_kernel, B=B, P=P, D=D, rows=dma_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h_poly, full
        ],
        out_specs=(
            pl.BlockSpec((B,), lambda k: (k,), memory_space=pltpu.VMEM),
            pl.BlockSpec((B,), lambda k: (k,), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((dma_rows, Dp), jnp.float32),
            pltpu.VMEM((dma_rows, Dp), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(fr, fi, h_poly)
    return yr[:M], yi[:M]


def fir_decim_pallas(
    x_ext: cplx.Complex,
    taps,
    decimation: int,
    block_b: int = 1024,
    interpret: bool = False,
) -> cplx.Complex:
    """Decimating FIR on an extended block (same contract as
    ops.fir.fir_extended with pair input and real taps)."""
    taps = jnp.asarray(taps, jnp.float32)
    yr, yi = _fir_decim_call(
        x_ext.re, x_ext.im, taps, int(decimation), block_b, interpret
    )
    return cplx.Complex(yr, yi)

"""Banded-matmul decimating FIR as a Pallas kernel (MXU, windows in VMEM).

The round-2 XLA banded path (ops/fir.py _fir_mxu) made the decimating FIR
a dense (rows, K) x (K, c) contraction — but XLA materializes the window
matrix A in HBM (~2x the signal bytes written + read back).  This kernel
assembles A in VMEM from a single streaming read of the signal:

  per grid program (R rows of c=128 outputs each):
    1. DMA (R + pad rows, G) of decimation row-chunks (G = c*D samples,
       row-major so the host-side reshape is free) HBM -> VMEM, for both
       planes;
    2. the window matrix A[r, i] = x[(k*R + r)*G + i] (width Kpad) is
       never materialized: the contraction splits over its q+1 row-slice
       parts, A @ W = sum_j A_j @ W_j, with each A_j realigned to sublane
       offset 0 by a cyclic roll — pure VMEM traffic;
    3. 2 (real taps) or 4 (complex taps) MXU matmuls per part against the
       constant banded tap matrix W[i, j] = h_rev[i - j*D];
    4. write the (R, c) decimated output tile(s).

HBM traffic: one read of the signal + the decimated write — the window
duplication that bounds the XLA path (VERDICT r2 weak #5) never leaves
VMEM.  Complex taps come from FreqShiftFir's shift folding, so this kernel
is the full fused front end: shift + FIR + decimate in one pass
(gsdrFmDemod precedent, fm_simpletest.cpp:400-414, restated for MXU+VMEM).

Two forms:

  * ``banded_fir_pallas`` — history form: caller supplies (or passes via
    ``history=``) an extended block; the wrapper materializes ONE
    [tail, block, pad] row buffer and the kernel windows it forward
    (W[i,j] = h_rev[i - j*D]).
  * ``banded_fir_prelude`` — zero-copy streaming form (r5): the tick is
    read straight from its natural (N/G, G) reshape; the carried history
    is 8 whole rows of the previous tick and the streaming window offset
    is baked into the band (W_b[i,j] = h_rev[i - b*G - j*D + (T-1)]), so
    NOTHING is copied outside the kernel.  Input DMA double-buffered
    across grid programs; backward parts contract only their nonzero
    128-aligned column range.

Mosaic constraints honored (benchmarks/pallas_mosaic_probes.py): DMA row
counts are sublane (8) multiples AND row offsets provably 8-aligned
(affine k*R-8 with R a multiple of 8 — a min()-clamped offset was
rejected), lane width G is a 128-multiple by construction (G = 128*D),
rank-matched ops only.

Taps must be CONCRETE (numpy / compile-time constants): the banded matrix
is built on the host at trace time, exactly like FreqShiftFir._mod_taps.
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

#: outputs per matmul column-tile — the MXU lane width.
_C = 128
#: output rows per grid program (sublane-friendly output tiles).
_R = 24
#: refuse shapes whose banded tap matrix would blow VMEM (the caller falls
#: back to the XLA path).
_MAX_W_BYTES = 8 << 20

#: MXU accumulation precision inside the kernels.  HIGHEST = bf16x6 (6
#: MXU passes, float32-faithful, -142 dB vs float64); HIGH = bf16x3
#: (-99 dB — 39 dB beyond the chain's -60 dB design bar at half the MXU
#: time).  The kernel is MXU-pass-bound once DMA is double-buffered
#: (benchmarks/kernel_floor_probe.py), so this knob is the FLOP lever.
import os as _os

#: 'high' maps to a MANUAL bf16x3 split in the prelude kernel (Mosaic's
#: in-kernel dot rejects lax.Precision.HIGH): s@W ~ s_hi@W_hi + s_lo@W_hi
#: + s_hi@W_lo with DEFAULT passes — 3 MXU passes, ~-99 dB, vs HIGHEST's
#: 6-pass f32-faithful stack.
# default 'high': the bf16x3 split saved ~33 us/2M-tick on chip (6551 vs
# 5919 Msps) at 4.7e-06 rel err -- 39 dB beyond the -60 dB design bar
# and 200x inside the reference's 1e-3 FIR tolerance (PROFILE_r05.json)
_PRECISION_MODE = _os.environ.get("TPUSDR_KERNEL_PRECISION", "high")
_KERNEL_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,  # legacy kernel: no HIGH in Mosaic
    "highest": jax.lax.Precision.HIGHEST,
}[_PRECISION_MODE]


def _plan(T: int, D: int):
    G = _C * D
    K = (_C - 1) * D + T
    kpad = round_up(K, 128)
    q = cdiv(kpad - G, G) if kpad > G else 0
    return G, kpad, q


def eligible(T: int, D: int, complex_taps: bool) -> bool:
    """Shapes this kernel handles well: decimating, tap matrix in VMEM.

    The w_bytes cap also bounds the Mosaic scoped-VMEM footprint (scratch
    + relayout copies of the rolled operands, measured 33.3 MB for the
    WBFM shape) under the 96 MB compiler budget below: the largest
    admitted shapes of both tap kinds were verified COMPILED on chip —
    real_250_125 (kpad=16128, w at the 8 MB cap) and cplx_546_50, both
    rel err <= 2e-7 vs the XLA mxu path (benchmarks/banded_verify.py,
    PROFILE_r04.json banded_verify rows)."""
    if D < 2:
        return False  # non-decimating: better served by fir_pallas / XLA
    _, kpad, q = _plan(T, D)
    w_bytes = kpad * _C * 4 * (2 if complex_taps else 1)
    return w_bytes <= _MAX_W_BYTES and q <= 2


def _band(h_rev: np.ndarray, kpad: int, D: int) -> np.ndarray:
    T = h_rev.shape[-1]
    i_idx = np.arange(kpad)[:, None] - np.arange(_C)[None, :] * D
    mask = (i_idx >= 0) & (i_idx < T)
    return np.where(mask, h_rev[np.clip(i_idx, 0, T - 1)], 0.0).astype(np.float32)


def _kernel(
    xr_ref,
    xi_ref,
    wr_ref,
    wi_ref,
    or_ref,
    oi_ref,
    sr0,
    si0,
    sr1,
    si1,
    sem_r0,
    sem_i0,
    sem_r1,
    sem_i1,
    *,
    R,
    G,
    kpad,
    q,
    dma_rows,
    cplx_taps,
):
    k = pl.program_id(0)
    n = pl.num_programs(0)

    def copies(kk, sr, si, sem_r, sem_i):
        cr = pltpu.make_async_copy(xr_ref.at[pl.ds(kk * R, dma_rows), :], sr, sem_r)
        ci = pltpu.make_async_copy(xi_ref.at[pl.ds(kk * R, dma_rows), :], si, sem_i)
        return cr, ci

    # Double-buffered DMA: program k computes from slot k%2 while the
    # DMA engine fills slot (k+1)%2 with program k+1's rows — the grid is
    # sequential on TPU, so without the prefetch every program stalls on
    # its own HBM->VMEM copy before touching the MXU.
    @pl.when(k == 0)
    def _():
        cr, ci = copies(0, sr0, si0, sem_r0, sem_i0)
        cr.start()
        ci.start()

    @pl.when((k + 1 < n) & (k % 2 == 0))
    def _():
        cr, ci = copies(k + 1, sr1, si1, sem_r1, sem_i1)
        cr.start()
        ci.start()

    @pl.when((k + 1 < n) & (k % 2 == 1))
    def _():
        cr, ci = copies(k + 1, sr0, si0, sem_r0, sem_i0)
        cr.start()
        ci.start()

    dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=_KERNEL_PRECISION,
    )

    # The window matrix A[r] = x[(kR + r)*G : ... + kpad] spans q+1 row
    # slices of the scratch; instead of concatenating them (Mosaic rejects
    # tpu.concatenate of operands at different sublane offsets, and
    # relayouting a sublane-shifted matmul operand compiled pathologically
    # — the 2026-08-20 chip probe never finished), split the contraction
    # over the band:
    #   A @ W = sum_j A_j @ W_j
    # with A_j realigned to sublane offset 0 via a roll (row r of
    # roll(s, -j) is s[r + j]), so every matmul operand is layout-clean:
    w_last = kpad - q * G
    parts = [(j, G) for j in range(q)]
    if w_last > 0:
        parts.append((q, w_last))

    def shifted(s, j):
        # roll requires a non-negative shift: rotating by rows-j is the
        # same cyclic permutation as by -j, so row r of the result is
        # s[r + j] for every r < rows - j (the only rows we slice).
        return s if j == 0 else pltpu.roll(s, dma_rows - j, 0)

    def compute(sr, si, sem_r, sem_i):
        cr, ci = copies(k, sr, si, sem_r, sem_i)
        cr.wait()
        ci.wait()

        def banded_dot(shifts, w):
            # contract with ALL dma_rows rows and slice the product: a
            # row-SLICED lhs at this K hangs the chip (2026-08-20 bisect:
            # (24 of 32, 6400) @ (6400, 128) never completes, full-rows
            # and narrow-K slices are fine).  The extra rows are one MXU
            # pass — the row dim is far under the 128 tile either way.
            acc = None
            for (j, width), s_j in zip(parts, shifts):
                term = dot(s_j[:, :width], w[j * G : j * G + width, :])
                acc = term if acc is None else acc + term
            return acc[0:R, :]

        sr_v = [shifted(sr[:], j) for j, _ in parts]
        si_v = [shifted(si[:], j) for j, _ in parts]
        if cplx_taps:
            wr = wr_ref[:]
            wi = wi_ref[:]
            or_ref[:] = banded_dot(sr_v, wr) - banded_dot(si_v, wi)
            oi_ref[:] = banded_dot(sr_v, wi) + banded_dot(si_v, wr)
        else:
            wr = wr_ref[:]
            or_ref[:] = banded_dot(sr_v, wr)
            oi_ref[:] = banded_dot(si_v, wr)

    @pl.when(k % 2 == 0)
    def _():
        compute(sr0, si0, sem_r0, sem_i0)

    @pl.when(k % 2 == 1)
    def _():
        compute(sr1, si1, sem_r1, sem_i1)


def banded_fir_pallas(
    x_ext: cplx.Complex,
    taps,
    decimation: int,
    interpret: bool = False,
    history: cplx.Complex | None = None,
) -> cplx.Complex:
    """Decimating FIR of an extended block (history prepended), complex
    data x real-or-complex CONCRETE taps; semantics identical to
    ops.fir.fir_extended(mode='mxu').  Call under an enclosing jit — the
    banded matrices fold to compile-time constants.

    Pass ``history`` separately (with ``x_ext`` = just the new block) to
    build the [history, block, pad] row buffer in ONE concatenate instead
    of a concat followed by a pad — each was a full-rate HBM read+write
    of the tick, together ~25%% of the front end's whole budget
    (benchmarks/offline_flat_probe.py attribution)."""
    if history is not None:
        hx = cplx.ensure_pair(history)
    else:
        hx = None
    if cplx.is_pair(taps):
        hr = np.asarray(taps.re, np.float32)
        hi = np.asarray(taps.im, np.float32)
    else:
        t = np.asarray(taps)
        if np.iscomplexobj(t):
            hr, hi = t.real.astype(np.float32), t.imag.astype(np.float32)
        else:
            hr, hi = t.astype(np.float32), None

    D = int(decimation)
    T = hr.shape[-1]
    H = hx.shape[-1] if hx is not None else 0
    L = x_ext.shape[-1] + H
    M = (L - (T - 1)) // D
    if M <= 0:
        return cplx.zeros(x_ext.shape[:-1] + (0,))
    if x_ext.re.ndim != 1:
        raise ValueError("banded_fir_pallas is single-stream (1-D) only")
    G, kpad, q = _plan(T, D)
    cplx_taps = hi is not None

    m_rows = cdiv(M, _C)
    n_prog = cdiv(m_rows, _R)
    m_rows_pad = n_prog * _R
    dma_rows = _R + round_up(max(q, 1), 8)
    total_rows = (n_prog - 1) * _R + dma_rows
    need = total_rows * G

    wr = jnp.asarray(_band(hr[::-1], kpad, D))
    # placeholder when taps are real (Mosaic wants a rank-matched ref)
    wi = jnp.asarray(_band(hi[::-1], kpad, D)) if cplx_taps else wr

    def prep(x, h):
        # ONE materialization: [history, block, zero pad] -> row layout
        pieces = [] if h is None else [h.astype(jnp.float32)]
        pad = need - L
        if pad >= 0:
            pieces.append(x.astype(jnp.float32))
            if pad > 0:
                pieces.append(jnp.zeros((pad,), jnp.float32))
        else:
            pieces.append(x[: x.shape[-1] + pad].astype(jnp.float32))
        flat = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
        return flat.reshape(total_rows, G)

    fr = prep(x_ext.re, None if hx is None else hx.re)
    fi = prep(x_ext.im, None if hx is None else hx.im)

    yr, yi = pl.pallas_call(
        functools.partial(
            _kernel,
            R=_R,
            G=G,
            kpad=kpad,
            q=q,
            dma_rows=dma_rows,
            cplx_taps=cplx_taps,
        ),
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_R, _C), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, _C), lambda k: (k, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_rows_pad, _C), jnp.float32),
            jax.ShapeDtypeStruct((m_rows_pad, _C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((dma_rows, G), jnp.float32),
            pltpu.VMEM((dma_rows, G), jnp.float32),
            pltpu.VMEM((dma_rows, G), jnp.float32),
            pltpu.VMEM((dma_rows, G), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # Mosaic's default 16 MB scoped-vmem budget rejects the relayout
        # copies of the sublane-shifted matmul operands at WBFM shapes
        # (measured 33.3 MB on v5e, 2026-08-20); the chip has 128 MB VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
        interpret=interpret,
    )(fr, fi, wr, wi)
    return cplx.Complex(yr.reshape(-1)[:M], yi.reshape(-1)[:M])


# ---------------------------------------------------------------------------
# Prelude form: zero-copy streaming input (r5 roofline attack)
# ---------------------------------------------------------------------------
#
# The history form above builds a [tail, block, pad] buffer per tick — one
# full-rate HBM read+write before the kernel reads the tick again.  The
# prelude form removes that copy entirely: the tick arrives as its natural
# (n_rows, G) reshape (free), the carried stream history arrives as 8 whole
# rows of the previous tick ("prelude"), and the window offset that made
# the prepend necessary is baked into the band matrices instead:
#
#   global output k: y[k] = sum_u h_rev[u] * s[k*D - (T-1) + u]
#
# so output row r needs rows r-B..r of the stream (B = ceil((T-1)/G) <= 8
# backward rows) and NEVER a forward row ((C-1)*D + 1 <= G).  Each part b
# contracts the scratch realigned by a roll with
#   W_b[i, j] = h_rev[i - b*G - j*D + (T-1)]
# Outputs are written by explicit DMA at dynamic row offsets, with the
# last grid program CLAMPED to the final R rows (overlap recompute, byte-
# identical writes), so ANY G-multiple tick length works — no padding.
#
# HBM traffic per tick: one DMA read of the tick (+20%% guard-row overlap)
# + the decimated write.  Nothing else.

#: candidate output-rows-per-program for the prelude kernel (first that
#: divides the tick's row count AND fits VMEM wins; all are sublane
#: multiples so every DMA row offset k*R - 8 is provably 8-aligned for
#: Mosaic).  Bigger R = fewer grid programs: the per-program fixed cost
#: (DMA issue/waits, rolls, branch scaffolding) measured as a first-order
#: term at R=40 (8 programs per 2M tick), so prefer the largest R the
#: VMEM budget takes.
_RP_CANDIDATES = (200, 160, 120, 80, 40, 32, 24, 16, 8)
_GUARD = 8  # prelude rows carried across ticks (sublane quantum)


def _pick_rp(n_rows: int, G: int, w_bytes: int) -> int | None:
    for r in _RP_CANDIDATES:
        if n_rows % r:
            continue
        # 4 scratch buffers + ~4 rolled relayout copies live at once
        foot = 8 * (r + _GUARD) * G * 4 + w_bytes
        if foot <= 80 << 20:
            return r
    return None


def _band_off(h_rev: np.ndarray, b: int, G: int, D: int) -> np.ndarray:
    """W_b[i, j] = h_rev[i - b*G - j*D + (T-1)] (zero outside [0, T))."""
    T = h_rev.shape[-1]
    idx = (
        np.arange(G)[:, None]
        - b * G
        - np.arange(_C)[None, :] * D
        + (T - 1)
    )
    mask = (idx >= 0) & (idx < T)
    return np.where(mask, h_rev[np.clip(idx, 0, T - 1)], 0.0).astype(np.float32)


def prelude_plan(T: int, D: int):
    G = _C * D
    B = cdiv(T - 1, G) if T > 1 else 0
    return G, B


def prelude_eligible(T: int, D: int, N: int, complex_taps: bool) -> bool:
    """Shapes the zero-copy prelude kernel takes: decimating, backward
    reach inside the guard rows, band matrices in VMEM, tick an 8G-row
    multiple (so every DMA offset is provably sublane-aligned)."""
    if D < 2:
        return False
    G, B = prelude_plan(T, D)
    if B > _GUARD - 1:
        return False
    w_bytes = (B + 1) * G * _C * 4 * (2 if complex_taps else 1)
    if w_bytes > 4 * _MAX_W_BYTES:
        return False
    if N % (_GUARD * G) or N < 2 * _GUARD * G:
        return False
    return _pick_rp(N // G, G, w_bytes) is not None


def _kernel_prelude(
    xr_ref,
    xi_ref,
    pr_ref,
    pi_ref,
    wr_ref,
    wi_ref,
    or_ref,
    oi_ref,
    s0r,
    s0i,
    s1r,
    s1i,
    sem_r0,
    sem_i0,
    sem_r1,
    sem_i1,
    *,
    R,
    G,
    B,
    cplx_taps,
    part_starts,
    n_prog,
):
    k = pl.program_id(0)
    n = pl.num_programs(0)
    dma_rows = R + _GUARD

    def in_copies(kk, sr, si, sem_r, sem_i):
        # extended rows [kk*R, kk*R + dma_rows); kk >= 1 only.  The
        # offset is written as (...) * 8 so Mosaic can PROVE the tile
        # index divisible by the sublane tiling — the equivalent
        # kk*R - GUARD form was rejected ("failed to prove").
        off = (kk * (R // 8) - 1) * 8
        cr = pltpu.make_async_copy(
            xr_ref.at[pl.ds(off, dma_rows), :], sr, sem_r
        )
        ci = pltpu.make_async_copy(
            xi_ref.at[pl.ds(off, dma_rows), :], si, sem_i
        )
        return cr, ci

    def first_copies(sr, si, sem_r, sem_i):
        # program 0: guard rows come from the prelude (copied from VMEM
        # below); DMA only x rows [0, R) into scratch rows [GUARD, ...)
        cr = pltpu.make_async_copy(
            xr_ref.at[pl.ds(0, R), :], sr.at[pl.ds(_GUARD, R), :], sem_r
        )
        ci = pltpu.make_async_copy(
            xi_ref.at[pl.ds(0, R), :], si.at[pl.ds(_GUARD, R), :], sem_i
        )
        return cr, ci

    @pl.when(k == 0)
    def _():
        s0r[pl.ds(0, _GUARD), :] = pr_ref[:, :]
        s0i[pl.ds(0, _GUARD), :] = pi_ref[:, :]
        cr, ci = first_copies(s0r, s0i, sem_r0, sem_i0)
        cr.start()
        ci.start()

    # prefetch program k+1 into the other slot (k+1 >= 1 always).  The
    # branches are skipped STRUCTURALLY for a single-program grid: even
    # untaken, tracing in_copies there would slice dma_rows > n_rows.
    if n_prog > 1:

        @pl.when((k + 1 < n) & (k % 2 == 0))
        def _():
            cr, ci = in_copies(k + 1, s1r, s1i, sem_r1, sem_i1)
            cr.start()
            ci.start()

        @pl.when((k + 1 < n) & (k % 2 == 1))
        def _():
            cr, ci = in_copies(k + 1, s0r, s0i, sem_r0, sem_i0)
            cr.start()
            ci.start()

    split3 = _PRECISION_MODE == "high"
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.DEFAULT if split3 else _KERNEL_PRECISION
        ),
    )

    def compute(sr, si, sem_r, sem_i):
        @pl.when(k == 0)
        def _():
            cr, ci = first_copies(sr, si, sem_r, sem_i)
            cr.wait()
            ci.wait()

        if n_prog > 1:

            @pl.when(k > 0)
            def _():
                cr, ci = in_copies(k, sr, si, sem_r, sem_i)
                cr.wait()
                ci.wait()

        # Result rows are indexed by SCRATCH row (extended row k*R-8+p):
        # part b contracts scratch rows p-b, so part 0 — the full-width
        # one — needs NO roll at all, and backward parts roll only their
        # nonzero column slice (~(T-1)/G of the tile).  The b extra
        # leading result rows are cut by the [GUARD:GUARD+R] slice below
        # (slicing the PRODUCT is safe; slicing a matmul lhs hangs the
        # chip — 2026-08-20 bisect).
        lo_rows = (B + 1) * G  # W layout: hi parts stacked above lo parts

        def banded_dot(shifts, w):
            acc = None
            for b, s_parts in shifts:
                st = part_starts[b]
                w_hi = w[b * G + st : (b + 1) * G, :]
                if split3:
                    s_hi, s_lo = s_parts
                    w_lo = w[
                        lo_rows + b * G + st : lo_rows + (b + 1) * G, :
                    ]
                    term = (
                        dot(s_hi, w_hi) + dot(s_lo, w_hi) + dot(s_hi, w_lo)
                    )
                else:
                    term = dot(s_parts, w_hi)
                acc = term if acc is None else acc + term
            return acc[_GUARD : _GUARD + R, :]

        def prep_plane(s):
            out = []
            full = s[:]
            for b in range(B + 1):
                st = part_starts[b]
                sl = full[:, st:] if st else full
                s_b = sl if b == 0 else pltpu.roll(sl, b, 0)
                if split3:
                    s_hi = s_b.astype(jnp.bfloat16).astype(jnp.float32)
                    out.append((b, (s_hi, s_b - s_hi)))
                else:
                    out.append((b, s_b))
            return out

        sr_v = prep_plane(sr)
        si_v = prep_plane(si)
        if cplx_taps:
            wr = wr_ref[:]
            wi = wi_ref[:]
            or_ref[:] = banded_dot(sr_v, wr) - banded_dot(si_v, wi)
            oi_ref[:] = banded_dot(sr_v, wi) + banded_dot(si_v, wr)
        else:
            wr = wr_ref[:]
            or_ref[:] = banded_dot(sr_v, wr)
            oi_ref[:] = banded_dot(si_v, wr)

    @pl.when(k % 2 == 0)
    def _():
        compute(s0r, s0i, sem_r0, sem_i0)

    @pl.when(k % 2 == 1)
    def _():
        compute(s1r, s1i, sem_r1, sem_i1)


def banded_fir_prelude(
    x: cplx.Complex,
    prelude: cplx.Complex,
    taps,
    decimation: int,
    interpret: bool = False,
) -> cplx.Complex:
    """Zero-copy streaming decimating FIR: y[k] = sum_u h_rev[u] *
    s[k*D - (T-1) + u] for the N/D outputs of this tick, where s is the
    stream with s[0] = x[0] and s[-8G..0) = the prelude rows (the last
    8 rows of the previous tick; zeros at stream start).

    ``x``: (N,) pair, N an 8G multiple; ``prelude``: (8, G) pair.
    Returns (N/D,) — numerically the fir_extended(mode='mxu') windows,
    read straight from the tick's natural (N/G, G) reshape with no
    prepend, pad, or trailing slice."""
    if cplx.is_pair(taps):
        hr = np.asarray(taps.re, np.float32)
        hi = np.asarray(taps.im, np.float32)
    else:
        t = np.asarray(taps)
        if np.iscomplexobj(t):
            hr, hi = t.real.astype(np.float32), t.imag.astype(np.float32)
        else:
            hr, hi = t.astype(np.float32), None

    D = int(decimation)
    T = hr.shape[-1]
    N = x.shape[-1]
    G, B = prelude_plan(T, D)
    if x.re.ndim != 1:
        raise ValueError("banded_fir_prelude is single-stream (1-D) only")
    if N % (_GUARD * G) or N < 2 * _GUARD * G:
        raise ValueError(f"tick {N} not a usable multiple of 8G={8 * G}")
    n_rows = N // G
    cplx_taps = hi is not None
    w_parts = B + 1
    if _PRECISION_MODE == "high":
        w_parts *= 2  # hi + lo stacks
    w_bytes = w_parts * G * _C * 4 * (2 if cplx_taps else 1)
    R = _pick_rp(n_rows, G, w_bytes)
    if R is None:
        raise ValueError(f"no program row count divides n_rows={n_rows}")

    def w_stack(h_plane):
        parts = np.concatenate(
            [_band_off(h_plane[::-1], b, G, D) for b in range(B + 1)], 0
        )
        if _PRECISION_MODE != "high":
            return jnp.asarray(parts)
        p_hi = parts.astype(np.float32)
        p_hi = p_hi.astype(jnp.bfloat16).astype(np.float32)
        return jnp.asarray(np.concatenate([p_hi, parts - p_hi], 0))

    wr = w_stack(hr)
    wi = w_stack(hi) if cplx_taps else wr  # rank-matched placeholder

    fr = x.re.reshape(n_rows, G).astype(jnp.float32)
    fi = x.im.reshape(n_rows, G).astype(jnp.float32)
    dma_rows = R + _GUARD

    yr, yi = pl.pallas_call(
        functools.partial(
            _kernel_prelude,
            R=R,
            G=G,
            B=B,
            cplx_taps=cplx_taps,
            part_starts=tuple(
                (max(0, b * G - (T - 1)) // 128) * 128 for b in range(B + 1)
            ),
            n_prog=n_rows // R,
        ),
        grid=(n_rows // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, _C), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, _C), lambda k: (k, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, _C), jnp.float32),
            jax.ShapeDtypeStruct((n_rows, _C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((dma_rows, G), jnp.float32),
            pltpu.VMEM((dma_rows, G), jnp.float32),
            pltpu.VMEM((dma_rows, G), jnp.float32),
            pltpu.VMEM((dma_rows, G), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
        interpret=interpret,
    )(fr, fi, prelude.re.astype(jnp.float32), prelude.im.astype(jnp.float32),
      wr, wi)
    return cplx.Complex(yr.reshape(-1), yi.reshape(-1))

"""Concrete Block library — the L3 "filters" of the framework.

Name-for-name coverage of the reference's registered node types
(/root/reference/src/filters/FilterFactories.cpp:132-150: AddConst,
AddConstToVectorLength, Component, Cosine, File, Fir, HackRfSource,
Int8ToFloat, Magnitude, Multiply, QuadDemod) plus TPU-build additions
(FreqShift, Resampler, Channelizer, Deemphasis, IqToComplex).  Each class
documents the reference filter it replaces.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp

from tpusdr.graph.block import Block, SourceBlock
from tpusdr.graph.registry import register_block
from tpusdr.ops import channelizer as chanops
from tpusdr.ops import convert, demod, fir, iir, mix, osc
from tpusdr.ops import resample as resops


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------


@register_block("Cosine")
class CosineSource(SourceBlock):
    """Oscillator source (CosineSource.cpp / ComplexCosineSource.cpp).

    ``sample_type`` 'Float' gives cos(theta); 'FloatComplex' gives
    exp(j*theta) — matching the reference's "Cosine" node with its
    sampleType parameter (RfToPcmAudioFactory.cpp:218-227).
    """

    def __init__(
        self,
        sample_rate: float,
        frequency: float,
        sample_type: str = "FloatComplex",
        amplitude: float = 1.0,
        initial_phase: float = 0.0,
    ):
        self.sample_rate = float(sample_rate)
        self.frequency = float(frequency)
        self.inc = osc.freq_to_inc_u32(frequency, sample_rate)
        self.amplitude = amplitude
        self.initial_phase = initial_phase
        self.complex = sample_type in ("FloatComplex", "ComplexFloat", "complex")
        self.out_dtype = jnp.complex64 if self.complex else jnp.float32

    def init_state(self, batch_shape=()):
        return osc.init_phase(self.initial_phase)

    def generate(self, state, n):
        if self.complex:
            y = osc.complex_cosine_block(state, self.inc, n, self.amplitude)
        else:
            y = osc.cosine_block(state, self.inc, n, self.amplitude)
        return osc.advance_phase(state, self.inc, n), y

    def shift_state(self, state, offset_samples):
        # Exact modular phase arithmetic: int32 offsets wrap correctly as
        # two's-complement uint32.
        off = jnp.asarray(offset_samples).astype(jnp.uint32)
        return state + jnp.uint32(self.inc) * off

    def advance_state(self, state, num_samples: int):
        return osc.advance_phase(state, self.inc, num_samples)

    def _params_updated(self, names: frozenset) -> None:
        if names & {"frequency", "sample_rate"}:
            self.inc = osc.freq_to_inc_u32(self.frequency, self.sample_rate)


# ---------------------------------------------------------------------------
# Format conversion
# ---------------------------------------------------------------------------


@register_block("Int8ToFloat")
class Int8ToFloat(Block):
    """int8 -> normalized float (Int8ToFloat.cpp:89-94)."""

    in_dtype = jnp.int8
    out_dtype = jnp.float32

    def __init__(self, scale: float = convert.INT8_SCALE):
        self.scale = scale

    def apply(self, state, x):
        return state, convert.int8_to_float(x, self.scale)


@register_block("Int16ToFloat")
class Int16ToFloat(Block):
    in_dtype = jnp.int16
    out_dtype = jnp.float32

    def __init__(self, scale: float = convert.INT16_SCALE):
        self.scale = scale

    def apply(self, state, x):
        return state, convert.int16_to_float(x, self.scale)


@register_block("IqToComplex")
class IqToComplex(Block):
    """IQ wire format -> complex64.

    Fuses the reference's CudaMemcpy + Int8ToFloat front end
    (nbfm_test.cpp:447-459) into one elementwise map.

    For the integer formats the stream element is one PACKED WORD per
    complex sample — int8 IQ arrives as little-endian int16 words, int16 IQ
    as int32 words (the host views the wire bytes for free: io sources /
    convert.pack_int8_words) — so the rate is 1:1 and the granule 1.
    Device-resident int8 is sub-word on TPU: loading + bitcasting it
    measured 5.1x slower than splitting the identical bytes from words
    (1.45 vs 7.47 Gsps of int8 scalars on v5e,
    benchmarks/int8_front_probe.py 2026-08-19).  A raw int8/int16 scalar
    array is rejected with a pointer at the packing helper.

    'float32' remains interleaved scalars (2:1) — f32 pairs have no wider
    word to pack into; cf32 captures enter as pairs via the runner anyway.
    """

    out_dtype = jnp.complex64

    def __init__(self, input_format: str = "int8"):
        self.input_format = input_format
        self.in_dtype = {
            "int8": jnp.int16,  # packed words, one per complex sample
            "int16": jnp.int32,
            "float32": jnp.float32,
        }[input_format]
        self.up, self.down = (1, 2) if input_format == "float32" else (1, 1)

    def apply(self, state, x):
        if self.input_format == "int8":
            if x.dtype == jnp.int8:
                raise TypeError(
                    "IqToComplex('int8') takes packed int16 words (one per "
                    "complex sample); view the wire bytes with "
                    "convert.pack_int8_words (free) — raw int8 arrays are "
                    "5x slower on TPU"
                )
            return state, convert.int8_words_to_complex(x)
        if self.input_format == "int16":
            if x.dtype == jnp.int16:
                raise TypeError(
                    "IqToComplex('int16') takes packed int32 words; view "
                    "the wire bytes with convert.pack_int16_words"
                )
            return state, convert.int16_words_to_complex(x)
        return state, convert.interleaved_to_complex(x)


# ---------------------------------------------------------------------------
# Filtering / mixing
# ---------------------------------------------------------------------------


@register_block("Fir")
class Fir(Block):
    """Decimating FIR (Fir.cpp + gsdrFirFF/FC/CC/CF).

    ``signal_type``/``tap_type`` mirror the reference's four type combos.
    """

    def __init__(
        self,
        taps: Sequence[float] | np.ndarray,
        decimation: int = 1,
        signal_type: str = "FloatComplex",
        mode: fir.FirMode = "auto",
    ):
        taps = np.asarray(taps)
        self.taps = jnp.asarray(
            taps.astype(np.complex64 if np.iscomplexobj(taps) else np.float32)
        )
        self.decimation = int(decimation)
        self.mode = mode
        self.down = self.decimation
        self.history = fir.history_len(taps.shape[-1])
        cplx = signal_type in ("FloatComplex", "ComplexFloat")
        self.in_dtype = jnp.complex64 if cplx else jnp.float32
        self.out_dtype = (
            jnp.complex64 if (cplx or np.iscomplexobj(taps)) else jnp.float32
        )

    def init_state(self, batch_shape=()):
        dt = "pair" if self.in_dtype == jnp.complex64 else self.in_dtype
        return fir.fir_init_state(self.taps, dt, batch_shape)

    def apply(self, state, x):
        # 'auto' resolves to the banded-matmul MXU path (ops/fir.py):
        # probed faster than the hand-written Pallas kernel at every
        # production shape (benchmarks/fir_mxu_probe.py: 5018 vs 4636
        # Msps(in) at the WBFM RF stage, 4085 vs 518 over poly at stage 1);
        # mode='pallas' keeps the VPU kernel path reachable; mode='banded'
        # selects the r3 banded MXU kernel with VMEM-assembled windows
        # (kernels/fir_banded_pallas.py).
        if self.mode == "pallas":
            return self._apply_pallas(state, x)
        if self.mode == "banded":
            return self._apply_banded(state, x)
        return fir.fir_apply(state, x, self.taps, self.decimation, self.mode)

    def _apply_banded(self, state, x):
        """Banded MXU kernel with windows assembled in VMEM; falls back to
        the XLA mxu path off-TPU or for shapes the kernel rejects."""
        from tpusdr.kernels.dispatch import pallas_mode
        from tpusdr.kernels.fir_banded_pallas import banded_fir_pallas, eligible
        from tpusdr.ops import cplx as _cplx

        mode = pallas_mode()
        t_np = np.asarray(self.taps)
        if (
            mode == "xla"
            or not _cplx.is_pair(x)
            or x.ndim != 1
            or not eligible(t_np.shape[-1], self.decimation, np.iscomplexobj(t_np))
        ):
            return fir.fir_apply(state, x, self.taps, self.decimation, "mxu")
        ext = _cplx.concat([_cplx.ensure_pair(state), x], axis=-1)
        y = banded_fir_pallas(
            ext, t_np, self.decimation, interpret=(mode == "interpret")
        )
        t = t_np.shape[-1]
        return ext[..., ext.shape[-1] - (t - 1) :], y

    def _pallas_eligible(self, x) -> bool:
        """Pair input, real taps, decimation >= 2, unbatched stream."""
        from tpusdr.ops import cplx as _cplx

        return (
            _cplx.is_pair(x)
            and x.ndim == 1
            and self.decimation >= 2
            and not jnp.iscomplexobj(self.taps)
        )

    def _params_updated(self, names: frozenset) -> None:
        # Fir::setTaps parity (Fir.cpp:124-139).  A tap-count change alters
        # the history length: the streaming state must be re-inited (the
        # reference reallocates its buffer the same way).
        if "taps" in names:
            t = np.asarray(self.taps)
            self.taps = jnp.asarray(
                t.astype(np.complex64 if np.iscomplexobj(t) else np.float32)
            )
            self.history = fir.history_len(t.shape[-1])
        if "decimation" in names:
            # keep the rate ratio derived, so the Chain-level guard SEES a
            # decimation change as the rate change it is and rejects it
            self.decimation = int(self.decimation)
            self.down = self.decimation

    def _apply_pallas(self, state, x):
        """VMEM-resident Pallas kernel path (kernels/fir_pallas.py).

        Requires pair input, real taps, decimation >= 2, unbatched stream;
        falls back to the XLA poly path otherwise."""
        if not self._pallas_eligible(x):
            return fir.fir_apply(state, x, self.taps, self.decimation, "poly")
        from tpusdr.kernels.dispatch import pallas_mode
        from tpusdr.kernels.fir_pallas import fir_decim_pallas
        from tpusdr.ops import cplx as _cplx

        mode = pallas_mode()
        if mode == "xla":  # Mosaic unavailable on this backend
            return fir.fir_apply(state, x, self.taps, self.decimation, "poly")
        ext = _cplx.concat([_cplx.ensure_pair(state), x], axis=-1)
        y = fir_decim_pallas(
            ext, self.taps, self.decimation, interpret=(mode == "interpret")
        )
        t = self.taps.shape[-1]
        new_state = ext[..., ext.shape[-1] - (t - 1) :]
        return new_state, y


@register_block("Multiply")
@register_block("MultiplyCCC")
class Multiply(Block):
    """Elementwise product of two streams (Multiply.cpp:131-158)."""

    n_inputs = 2

    def apply(self, state, a, b):
        return state, mix.multiply(a, b)


@register_block("FreqShift")
class FreqShift(Block):
    """Fused oscillator + multiply frequency translation.

    Replaces the reference's Cosine -> Multiply pair
    (RfToPcmAudioFactory.cpp:218-243) with a single NCO-phased elementwise
    op; ``frequency`` is the shift applied to the spectrum (a component at
    ``-frequency`` moves to DC when frequency = -f_offset).
    """

    def __init__(self, sample_rate: float, frequency: float, initial_phase: float = 0.0):
        self.sample_rate = float(sample_rate)
        self.frequency = float(frequency)
        self.inc = osc.freq_to_inc_u32(frequency, sample_rate)
        self.initial_phase = initial_phase

    def init_state(self, batch_shape=()):
        return mix.freq_shift_init(self.initial_phase)

    def apply(self, state, x):
        return mix.freq_shift_apply(state, x, self.inc)

    def shift_state(self, state, offset_samples):
        off = jnp.asarray(offset_samples).astype(jnp.uint32)
        return state + jnp.uint32(self.inc) * off

    def advance_state(self, state, num_samples: int):
        return osc.advance_phase(state, self.inc, num_samples)

    def _params_updated(self, names: frozenset) -> None:
        # Retuning (the reference's updateParameters use case): new shift
        # frequency takes effect on the next trace; the uint32 phase carry
        # remains valid (phase is continuous across a frequency step).
        if names & {"frequency", "sample_rate"}:
            self.inc = osc.freq_to_inc_u32(self.frequency, self.sample_rate)


@register_block("CosineMix")
class CosineMix(Block):
    """Multiply a real stream by a real cosine — the reference's
    Float-sampleType Cosine -> Multiply idiom, used as an audio pitch
    shifter (145.45_digital_signal_to_audio.cpp:538-546: shift by -800 Hz,
    then low-pass one of the two images).  Real in, real out; the +/-f
    images are both produced, so follow with a lowpass.  Same drift-free
    uint32 NCO phase as FreqShift."""

    in_dtype = jnp.float32
    out_dtype = jnp.float32

    def __init__(self, sample_rate: float, frequency: float, initial_phase: float = 0.0):
        self.sample_rate = float(sample_rate)
        self.frequency = float(frequency)
        self.inc = osc.freq_to_inc_u32(frequency, sample_rate)
        self.initial_phase = float(initial_phase)

    def init_state(self, batch_shape=()):
        return osc.init_phase(self.initial_phase)

    def apply(self, state, x):
        lo = osc.cosine_block(state, self.inc, x.shape[-1])
        return osc.advance_phase(state, self.inc, x.shape[-1]), x * lo

    def shift_state(self, state, offset_samples):
        off = jnp.asarray(offset_samples).astype(jnp.uint32)
        return state + jnp.uint32(self.inc) * off

    def advance_state(self, state, num_samples: int):
        return osc.advance_phase(state, self.inc, num_samples)

    def _params_updated(self, names: frozenset) -> None:
        if names & {"frequency", "sample_rate"}:
            self.inc = osc.freq_to_inc_u32(self.frequency, self.sample_rate)


@register_block("FreqShiftFir")
class FreqShiftFir(Block):
    """Frequency shift folded into a decimating FIR (one MXU pass).

    Equivalent to FreqShift(fs, f) -> Fir(taps, D), with the full-rate
    oscillator + multiply eliminated: modulating the (compile-time) taps
    moves the shift into the banded tap matrix,

        y[m] = e^{j theta(mD)} * sum_k (h_rev[k] e^{j k w}) x[mD + k],

    so the only remaining full-rate op is the FIR contraction itself and
    the output rotation runs at the decimated rate (1/D of the work).
    Phase is the same drift-free uint32 NCO as FreqShift (exact across
    blocks and shards).  Precedent for fusing these stages: the
    reference's gsdrFmDemod front end (fm_simpletest.cpp:400-414).
    """

    out_dtype = jnp.complex64

    def __init__(
        self,
        sample_rate: float,
        frequency: float,
        taps,
        decimation: int,
        initial_phase: float = 0.0,
        mode: fir.FirMode = "auto",
    ):
        taps = np.asarray(taps)
        if np.iscomplexobj(taps):
            raise ValueError("FreqShiftFir folds the shift itself; taps must be real")
        self.sample_rate = float(sample_rate)
        self.frequency = float(frequency)
        self.inc = osc.freq_to_inc_u32(frequency, sample_rate)
        self.taps = taps.astype(np.float32)
        self.decimation = int(decimation)
        self.down = self.decimation
        self.mode = mode
        self.initial_phase = float(initial_phase)
        self.history = len(self.taps) - 1

    def _mod_taps_np(self) -> np.ndarray:
        """taps[j] * e^{j theta(T-1-j)} — angles from the exact uint32
        accumulator, evaluated in float64 (host-side compile-time
        constants; must stay numpy so tracing never captures them)."""
        T = len(self.taps)
        k = (T - 1 - np.arange(T)) * int(self.inc) % (1 << 32)
        ang = k.astype(np.float64) * (2.0 * np.pi / 2.0**32)
        return (self.taps * np.exp(1j * ang)).astype(np.complex64)

    def _mod_taps(self):
        from tpusdr.ops import cplx as _cplx

        t = self._mod_taps_np()
        return _cplx.Complex(
            jnp.asarray(t.real.copy()), jnp.asarray(t.imag.copy())
        )

    def _banded(self, tail, x):
        """Banded MXU kernel (VMEM windows) for the folded complex-tap FIR;
        falls back to the XLA mxu path off-TPU / for rejected shapes.

        Measured on v5e (r4, PROFILE_r04.json): the ISOLATED stage is
        faster on the XLA mxu path (6893 vs 5648 Msps at T=546/D=50), so
        'banded' is NOT the default here; the kernel earns its keep inside
        FusedFmDemod, where the fused chain beats the unfused one
        (4982.6 vs 4674.6 Msps, BENCH_configs_r04.json)."""
        from tpusdr.kernels.dispatch import pallas_mode
        from tpusdr.kernels.fir_banded_pallas import banded_fir_pallas, eligible

        mode = pallas_mode()
        if (
            mode == "xla"
            or x.re.ndim != 1
            or not eligible(len(self.taps), self.decimation, True)
        ):
            from tpusdr.ops import cplx as _cplx

            ext = _cplx.concat([tail, x], axis=-1)
            return fir.fir_extended(ext, self._mod_taps(), self.decimation, "mxu")
        return banded_fir_pallas(
            x,
            self._mod_taps_np(),
            self.decimation,
            interpret=(mode == "interpret"),
            history=tail,
        )

    def init_state(self, batch_shape=()):
        from tpusdr.ops import cplx as _cplx

        T = len(self.taps)
        # phase of the first history sample: T-1 zeros precede the stream.
        back = (int(osc.init_phase(self.initial_phase)) - int(self.inc) * (T - 1)) % (
            1 << 32
        )
        return {
            "tail": _cplx.zeros(tuple(batch_shape) + (T - 1,)),
            "phase": jnp.uint32(back),
        }

    def apply(self, state, x):
        from tpusdr.ops import cplx as _cplx

        xp = _cplx.ensure_pair(x)
        n = x.shape[-1]
        hist = len(self.taps) - 1
        if self.mode == "banded":
            v = self._banded(state["tail"], xp)
            if n >= hist:
                new_tail = xp[..., n - hist :]
            else:
                new_tail = _cplx.concat([state["tail"], xp], axis=-1)[..., -hist:]
        else:
            ext = _cplx.concat([state["tail"], xp], axis=-1)
            v = fir.fir_extended(ext, self._mod_taps(), self.decimation, self.mode)
            new_tail = ext[..., ext.shape[-1] - hist :]
        rot = osc.complex_cosine_block(
            state["phase"],
            np.uint32(int(self.inc) * self.decimation % (1 << 32)),
            v.shape[-1],
        )
        y = v * rot
        new_state = {
            "tail": new_tail,
            "phase": state["phase"] + jnp.uint32(int(self.inc) * n % (1 << 32)),
        }
        return new_state, _cplx.maybe_native(y, x)

    def shift_state(self, state, offset_samples):
        off = jnp.asarray(offset_samples).astype(jnp.uint32)
        return {
            "tail": state["tail"],
            "phase": state["phase"] + jnp.uint32(self.inc) * off,
        }

    def advance_state(self, state, num_samples: int):
        return {
            "tail": state["tail"],
            "phase": state["phase"]
            + jnp.uint32(int(self.inc) * num_samples % (1 << 32)),
        }

    def _params_updated(self, names: frozenset) -> None:
        if names & {"frequency", "sample_rate"}:
            self.inc = osc.freq_to_inc_u32(self.frequency, self.sample_rate)
        if "taps" in names:
            self.taps = np.asarray(self.taps, np.float32)
            self.history = len(self.taps) - 1
        if "decimation" in names:
            self.decimation = int(self.decimation)
            self.down = self.decimation


@register_block("FusedFmDemod")
class FusedFmDemod(Block):
    """Fused shift -> decimating FIR -> FM discriminator (gsdrFmDemod
    precedent, fm_simpletest.cpp:400-414).

    Equivalent to FreqShift(frequency) -> Fir(taps, D) -> QuadFmDemod(gain)
    in one HBM pass.  The r3 form folds the shift into complex taps
    (FreqShiftFir math) and runs the banded MXU kernel with VMEM-resident
    windows (kernels/fir_banded_pallas.py); the residual per-output
    rotation e^{j*D*w} cancels in the discriminator's conjugate product up
    to a constant angle, applied as one audio-rate complex rotation.  No
    full-rate VPU work remains — the r2 VPU MAC kernel (kernels/
    fm_pallas.py) lost to the unfused MXU chain 2549 vs 4478 Msps
    (BENCH_configs_r02) and is kept only as the fallback for shapes the
    banded kernel rejects.  Carry: last (T-1)+D input samples + NCO phase.
    """

    out_dtype = jnp.float32

    def __init__(
        self,
        sample_rate: float,
        frequency: float,
        taps,
        decimation: int,
        gain: float,
        block_b: int = 1024,
    ):
        from tpusdr.kernels.fir_banded_pallas import eligible, prelude_plan

        self.sample_rate = float(sample_rate)
        self.frequency = float(frequency)
        self.inc = osc.freq_to_inc_u32(frequency, sample_rate)
        self.taps = np.asarray(taps, np.float32)
        self.decimation = int(decimation)
        self.down = self.decimation
        self.gain = float(gain)
        self.block_b = block_b
        self.history = (len(self.taps) - 1) + self.decimation
        # Zero-copy (prelude) kernel plan: when the banded kernel takes
        # the shape, the carry holds 8 whole (G,) decimation rows of the
        # previous tick and the kernel reads the tick straight from its
        # natural (N/G, G) reshape — no prepend/pad copy at all.  The
        # granule grows to G so chain planning produces row-exact ticks.
        self._G, self._B = prelude_plan(len(self.taps), self.decimation)
        self._rows_capable = eligible(len(self.taps), self.decimation, True)
        from tpusdr.kernels.fir_banded_pallas import _GUARD

        self._tail_len = (
            _GUARD * self._G if self._rows_capable else self.history
        )

    @property
    def granule(self) -> int:
        # the prelude kernel wants ticks in whole 8-row (sublane) bands
        from tpusdr.kernels.fir_banded_pallas import _GUARD

        return _GUARD * self._G if self._rows_capable else self.down

    def init_state(self, batch_shape=()):
        from tpusdr.ops import cplx as _cplx

        if batch_shape:
            raise ValueError("FusedFmDemod is a single-stream block")
        # phase of the first carried sample: tail_len samples precede the
        # stream origin, so back the phase up by that many increments.
        back = np.uint32((-int(self.inc) * self._tail_len) % (1 << 32))
        return {
            "tail": _cplx.zeros((self._tail_len,)),
            "phase": jnp.uint32(back),
            # previous decimated FIR output (the discriminator's lookback
            # when the prelude kernel computes exactly N/D outputs)
            "vprev": _cplx.zeros((1,)),
        }

    def apply(self, state, x):
        from tpusdr.kernels.dispatch import pallas_mode
        from tpusdr.kernels.fir_banded_pallas import prelude_eligible
        from tpusdr.ops import cplx as _cplx

        mode = pallas_mode()
        n = x.shape[-1]
        T = len(self.taps)
        interpret = mode == "interpret"
        new_vprev = state["vprev"]
        if (
            mode != "xla"
            and self._rows_capable
            and x.re.ndim == 1
            and prelude_eligible(T, self.decimation, n, True)
        ):
            y, new_vprev = self._apply_prelude(
                x, state["tail"], state["vprev"], interpret
            )
        elif mode != "xla" and self._rows_capable and x.re.ndim == 1:
            # banded kernel, single-copy history prep (non-row ticks)
            y, new_vprev = self._apply_banded(
                x, state["tail"][..., -self.history :], interpret
            )
        else:
            # phase of ext[0]: the carry is tail_len samples deep but the
            # ext built here starts history samples back
            ph = state["phase"] + jnp.uint32(
                (int(self.inc) * (self._tail_len - self.history)) % (1 << 32)
            )
            ext = _cplx.concat(
                [state["tail"][..., -self.history :], x], axis=-1
            )
            if mode == "xla":
                y = self._apply_xla(ph, ext)
            else:
                from tpusdr.kernels.fm_pallas import fused_fm_demod_pallas

                y = fused_fm_demod_pallas(
                    ext,
                    self.taps,
                    self.decimation,
                    self.inc,
                    ph,
                    self.gain,
                    self.block_b,
                    interpret=interpret,
                )
        L = self._tail_len
        if n >= L:
            new_tail = x[..., n - L :]
        else:
            new_tail = _cplx.concat([state["tail"], x], axis=-1)[..., -L:]
        new_state = {
            "tail": new_tail,
            "phase": state["phase"] + jnp.uint32((int(self.inc) * n) % (1 << 32)),
            "vprev": new_vprev,
        }
        return new_state, y

    def _mod_taps_np(self) -> np.ndarray:
        """taps[j] * e^{j theta(T-1-j)} (FreqShiftFir._mod_taps, as numpy —
        the banded kernel folds them into its constant tap matrix)."""
        T = len(self.taps)
        k = (T - 1 - np.arange(T)) * int(self.inc) % (1 << 32)
        ang = k.astype(np.float64) * (2.0 * np.pi / 2.0**32)
        return (self.taps * np.exp(1j * ang)).astype(np.complex64)

    def _apply_banded(self, x, tail, interpret: bool):
        """Banded MXU kernel + audio-rate discriminator.

        With the shift folded into the taps, the filtered-decimated stream
        is y[m] = e^{j(phi0 + m*D*w)} v[m]; the discriminator product
        y[m+1] conj(y[m]) = v[m+1] conj(v[m]) * e^{j*D*w} — the absolute
        phase cancels and the residual is ONE constant rotation at the
        decimated rate.
        """
        from tpusdr.kernels.fir_banded_pallas import banded_fir_pallas

        v = banded_fir_pallas(
            x, self._mod_taps_np(), self.decimation, interpret, history=tail
        )
        return self._discriminate(v[..., 1:], v[..., :-1]), v[..., -1:]

    def _apply_prelude(self, x, tail, vprev, interpret: bool):
        """Zero-copy banded kernel: the tick is read straight from its
        (N/G, G) reshape with the carried 8 prelude rows; exactly N/D
        FIR outputs come back, and the discriminator's one-sample
        lookback is the carried previous output ``vprev``."""
        from tpusdr.kernels.fir_banded_pallas import _GUARD, banded_fir_prelude
        from tpusdr.ops import cplx as _cplx

        G = self._G
        pre = _cplx.Complex(
            tail.re.reshape(_GUARD, G), tail.im.reshape(_GUARD, G)
        )
        v = banded_fir_prelude(
            x, pre, self._mod_taps_np(), self.decimation, interpret
        )
        vfull = _cplx.concat([vprev, v], axis=-1)
        return self._discriminate(vfull[..., 1:], vfull[..., :-1]), v[..., -1:]

    def _discriminate(self, v_cur, v_prev):
        """prod = v[k] conj(v[k-1]) de-rotated by the constant folded-
        shift residual e^{j*D*w}, then the atan discriminator."""
        from tpusdr.ops import xmath

        prod = v_cur * v_prev.conj()
        wd = (
            (int(self.inc) * self.decimation) % (1 << 32)
        ) * (2.0 * np.pi / 2.0**32)
        c, s = np.float32(np.cos(wd)), np.float32(np.sin(wd))
        pr = prod.re * c - prod.im * s
        pi = prod.re * s + prod.im * c
        return jnp.float32(self.gain) * xmath.atan2(pi, pr)

    def _apply_xla(self, phase0, ext):
        """Same math via XLA ops (mix -> poly FIR -> discriminator); used
        where compiled Mosaic is unavailable (kernels/dispatch.py)."""
        from tpusdr.ops import cplx as _cplx
        from tpusdr.ops import xmath

        lo = osc.complex_cosine_block(phase0, self.inc, ext.shape[-1])
        u = ext * lo
        v = fir.fir_extended(u, jnp.asarray(self.taps), self.decimation, "poly")
        prod = v[..., 1:] * v[..., :-1].conj()
        return (jnp.float32(self.gain) * xmath.atan2(prod.im, prod.re)).astype(
            jnp.float32
        )

    def shift_state(self, state, offset_samples):
        off = jnp.asarray(offset_samples).astype(jnp.uint32)
        return {
            **state,
            "phase": state["phase"] + jnp.uint32(self.inc) * off,
        }

    def advance_state(self, state, num_samples: int):
        return {
            **state,
            "phase": state["phase"]
            + jnp.uint32((int(self.inc) * num_samples) % (1 << 32)),
        }

    def _params_updated(self, names: frozenset) -> None:
        if names & {"frequency", "sample_rate"}:
            self.inc = osc.freq_to_inc_u32(self.frequency, self.sample_rate)
        if names & {"taps", "decimation"}:
            from tpusdr.kernels.fir_banded_pallas import (
                _GUARD,
                eligible,
                prelude_plan,
            )

            self.taps = np.asarray(self.taps, np.float32)
            self.decimation = int(self.decimation)
            self.down = self.decimation
            self.history = (len(self.taps) - 1) + self.decimation
            self._G, self._B = prelude_plan(len(self.taps), self.decimation)
            self._rows_capable = eligible(len(self.taps), self.decimation, True)
            self._tail_len = (
                _GUARD * self._G if self._rows_capable else self.history
            )
            # carried states sized for the old taps are invalid; the next
            # init_state() builds the right carry (Fir.cpp:124 setTaps
            # parity -- the reference also resets its retained buffer)


# ---------------------------------------------------------------------------
# Demodulators & elementwise
# ---------------------------------------------------------------------------


@register_block("QuadFmDemod")
class QuadFmDemod(Block):
    """FM discriminator (QuadFmDemod.cpp:76-113). Carry: 1 complex sample."""

    history = 1
    out_dtype = jnp.float32

    def __init__(self, gain: float | None = None, sample_rate: float | None = None,
                 channel_width: float | None = None):
        if gain is None:
            if sample_rate is None or channel_width is None:
                raise ValueError("need gain or (sample_rate, channel_width)")
            gain = demod.quad_fm_demod_gain(sample_rate, channel_width)
        self.gain = float(gain)

    def init_state(self, batch_shape=()):
        return demod.quad_fm_demod_init(batch_shape)

    def apply(self, state, x):
        return demod.quad_fm_demod_apply(state, x, self.gain)


@register_block("QuadAmDemod")
class QuadAmDemod(Block):
    """AM envelope demod (QuadAmDemod.cpp:81-108). Stateless, 1:1."""

    out_dtype = jnp.float32

    def apply(self, state, x):
        return state, demod.quad_am_demod(x)


def make_quad_demod(modulation: str, **kw) -> Block:
    """Reference "QuadDemod" node dispatching on modulation
    (FilterFactories registry + Modulation.h:23-26)."""
    m = modulation.lower()
    if m in ("fm", "modulation_fm"):
        return QuadFmDemod(**kw)
    if m in ("am", "modulation_am"):
        kw.pop("sample_rate", None)
        kw.pop("channel_width", None)
        return QuadAmDemod()
    raise ValueError(f"unknown modulation {modulation!r}")


register_block("QuadDemod")(make_quad_demod)


@register_block("Magnitude")
class Magnitude(Block):
    """|z| (Magnitude.cpp:91-96)."""

    out_dtype = jnp.float32

    def apply(self, state, x):
        return state, demod.magnitude(x)


@register_block("AddConst")
class AddConst(Block):
    """Scalar add (AddConst.cpp:99)."""

    in_dtype = jnp.float32
    out_dtype = jnp.float32

    def __init__(self, add_value: float = 0.0):
        self.add_value = float(add_value)

    def apply(self, state, x):
        return state, demod.add_const(x, self.add_value)


@register_block("AddConstToVectorLength")
class AddConstToVectorLength(Block):
    """Magnitude-bias of complex samples (AddConstToVectorLength.cpp:97-103)."""

    def __init__(self, add_value_to_magnitude: float = 0.0):
        self.add_value = float(add_value_to_magnitude)

    def apply(self, state, x):
        return state, demod.add_const_to_vector_length(x, self.add_value)


@register_block("DcBlock")
class DcBlock(Block):
    """DC blocker: y[n] = x[n] - x[n-1] + a*y[n-1] (one zero at DC, pole at
    a).  Used after AM envelope detection to strip the carrier level — the
    role AddConstToVectorLength plays in am_test.cpp, without needing to
    know the carrier amplitude."""

    in_dtype = jnp.float32
    out_dtype = jnp.float32
    history = 1
    time_shardable = False  # IIR: unbounded memory, runs post-gather

    def __init__(self, pole: float = 0.999):
        self.pole = float(pole)

    def init_state(self, batch_shape=()):
        return {
            "x1": jnp.zeros(tuple(batch_shape) + (1,), jnp.float32),
            "y1": iir.single_pole_init(batch_shape),
        }

    def apply(self, state, x):
        x_prev = jnp.concatenate([state["x1"], x[..., :-1]], axis=-1)
        diff = x - x_prev
        y1, y = iir.single_pole_apply(state["y1"], diff, self.pole, 1.0)
        new_state = {"x1": x[..., -1:], "y1": y1}
        return new_state, y


@register_block("ReadByteCountMonitor")
@register_block("SampleCountMonitor")
class SampleCountMonitor(Block):
    """Pass-through sample counter (ReadByteCountMonitor.cpp:44-63 — the
    reference's only throughput metric and its run-loop termination
    condition, nbfm_test.cpp:571).  The count lives in the carry so it
    survives checkpoints; host-side totals also exist in RunStats."""

    def init_state(self, batch_shape=()):
        return jnp.zeros((), jnp.int32)

    def apply(self, state, x):
        return state + jnp.int32(x.shape[-1]), x


@register_block("Deemphasis")
class Deemphasis(Block):
    """FM de-emphasis one-pole IIR (time constants from fm.h:20-21).

    Although an IIR has unbounded memory, the initial-state influence
    decays as a^n, so under time sharding a warmup of
    n = ln(1e-7)/ln(a) samples re-creates the carry to below -140 dB —
    ``history`` is sized accordingly and the block stays time-shardable
    (SURVEY.md hard part (a) generalized to IIR stages).  Poles too close
    to 1 (warmup > _MAX_IIR_WARMUP) fall back to the sequential tail.
    """

    in_dtype = jnp.float32
    out_dtype = jnp.float32

    _MAX_IIR_WARMUP = 1 << 15

    def __init__(self, sample_rate: float, tau: float = 75e-6):
        import math as _math

        self.a, self.b = iir.deemphasis_coeffs(tau, sample_rate)
        self.tau = tau
        self.sample_rate = sample_rate
        warmup = int(_math.ceil(_math.log(1e-7) / _math.log(self.a)))
        if warmup <= self._MAX_IIR_WARMUP:
            self.history = warmup
            self.time_shardable = True
        else:
            self.history = 1
            self.time_shardable = False

    def init_state(self, batch_shape=()):
        return iir.single_pole_init(batch_shape)

    def apply(self, state, x):
        return iir.single_pole_apply(state, x, self.a, self.b)

    def _params_updated(self, names: frozenset) -> None:
        if names & {"tau", "sample_rate"}:
            import math as _math

            self.a, self.b = iir.deemphasis_coeffs(self.tau, self.sample_rate)
            warmup = int(_math.ceil(_math.log(1e-7) / _math.log(self.a)))
            self.time_shardable = warmup <= self._MAX_IIR_WARMUP
            self.history = warmup if self.time_shardable else 1


# ---------------------------------------------------------------------------
# Rate conversion
# ---------------------------------------------------------------------------


@register_block("Resampler")
class Resampler(Block):
    """Rational polyphase resampler (capability the reference lacks)."""

    def __init__(
        self,
        up: int,
        down: int,
        taps: np.ndarray | None = None,
        db_attenuation: float = -60.0,
        signal_type: str = "Float",
    ):
        import math as _math

        g = _math.gcd(int(up), int(down))
        self.up, self.down = int(up) // g, int(down) // g
        is_cplx = signal_type in ("FloatComplex", "ComplexFloat")
        self.in_dtype = jnp.complex64 if is_cplx else jnp.float32
        self.out_dtype = self.in_dtype
        if taps is None:
            taps = resops.design_resampler_taps(self.up, self.down, db_attenuation)
        self.taps = np.asarray(taps, np.float32)
        self._plans: dict[int, resops.ResamplerPlan] = {}
        import tpusdr.utils.numerics as _num

        self.history = _num.cdiv(len(self.taps), self.up) - 1

    def _plan(self, n: int) -> resops.ResamplerPlan:
        if n not in self._plans:
            self._plans[n] = resops.make_plan(self.taps, self.up, self.down, n)
        return self._plans[n]

    def init_state(self, batch_shape=()):
        from tpusdr.ops import cplx as _cplx

        shape = tuple(batch_shape) + (self.history,)
        if self.in_dtype == jnp.complex64:
            return _cplx.zeros(shape)
        return jnp.zeros(shape, dtype=self.in_dtype)

    def apply(self, state, x):
        plan = self._plan(x.shape[-1])
        return resops.resample_apply(state, x, plan)

    def _params_updated(self, names: frozenset) -> None:
        if "taps" in names:
            import tpusdr.utils.numerics as _num

            self.taps = np.asarray(self.taps, np.float32)
            self._plans.clear()
            self.history = _num.cdiv(len(self.taps), self.up) - 1


@register_block("Channelizer")
class Channelizer(Block):
    """M-channel maximally-decimated PFB channelizer (ops/channelizer.py).

    Output gains a leading channel axis: (..., N) -> (..., M, N//M); the
    channel axis is the natural mesh-sharding axis (BASELINE.md config 4).
    """

    adds_channel_axis = True

    def __init__(
        self,
        num_channels: int,
        taps: np.ndarray | None = None,
        taps_per_channel: int = 12,
        db_attenuation: float = -60.0,
    ):
        self.num_channels = int(num_channels)
        self.down = self.num_channels
        if taps is None:
            taps = chanops.design_prototype(
                self.num_channels, taps_per_channel, db_attenuation
            )
        self.taps = np.asarray(taps, np.float32)
        self._plans: dict[int, chanops.ChannelizerPlan] = {}
        self.history = len(self.taps) - 1

    def _plan(self, n: int) -> chanops.ChannelizerPlan:
        if n not in self._plans:
            self._plans[n] = chanops.make_plan(self.taps, self.num_channels, n)
        return self._plans[n]

    def init_state(self, batch_shape=()):
        plan_hist = (
            (len(self.taps) + self.num_channels - 1) // self.num_channels
        ) * self.num_channels - 1
        from tpusdr.ops import cplx as _cplx

        return _cplx.zeros(tuple(batch_shape) + (plan_hist,))

    def apply(self, state, x):
        plan = self._plan(x.shape[-1])
        # channel-major output (..., M, F): downstream per-channel blocks
        # see time on the last axis.  Computed natively in that layout —
        # the r2 form (row-major + post-transpose) left every intermediate
        # with a narrow M-lane minor axis, measured as config 4's
        # bottleneck (ops/channelizer.py channelize_apply docstring).
        return chanops.channelize_apply(state, x, plan, channel_major=True)

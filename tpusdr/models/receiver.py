"""Single-channel RF -> PCM receiver builders.

TPU-native re-design of the reference's RfToPcmAudioFactory
(/root/reference/src/filters/factories/RfToPcmAudioFactory.cpp:130-317):
the same logical chain —

    [iq convert] -> freq shift -> RF lowpass FIR (decimate) ->
    quad demod (FM discriminator | AM envelope) ->
    [de-emphasis] -> audio lowpass / resample -> PCM

— but with the cosine+multiply pair fused into one NCO op, a *rational*
audio resampler instead of integer-only decimation, and FM de-emphasis
(the reference ships the tau constants, fm.h:20-21, but no filter).

Band constants mirror include/gpusdrpipeline/fm.h and am.h:
NBFM 15 kHz / 5 kHz dev; WBFM 200 kHz / 75 kHz dev; AM 10 kHz bandwidth.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from fractions import Fraction

from tpusdr.graph.blocks import (
    DcBlock,
    Deemphasis,
    Fir,
    FreqShift,
    IqToComplex,
    QuadAmDemod,
    QuadFmDemod,
    Resampler,
)
from tpusdr.graph.chain import Chain
from tpusdr.ops import demod, design
from tpusdr.utils.logging import get_logger

log = get_logger("models")

# Band/deviation constants (fm.h:20-27, am.h:20).
TAU_EU = 50e-6
TAU_US = 75e-6
NBFM_CHANNEL_WIDTH = 15e3
WBFM_CHANNEL_WIDTH = 200e3
NBFM_DEVIATION = 5e3
WBFM_DEVIATION = 75e3
AM_BANDWIDTH = 10e3


@dataclass(frozen=True)
class ReceiverSpec:
    """Resolved rates/design of a receiver chain (for logging/tests)."""

    rf_sample_rate: float
    channel_width: float
    rf_decimation: int
    quad_rate: float
    audio_rate: float
    rf_taps: int  # total taps across RF decimation stages
    resampler: tuple[int, int]
    quad_gain: float
    rf_stages: tuple[tuple[int, int], ...] = ()  # (taps, decim) per stage


NBFM = "nbfm"
WBFM = "wbfm"
AM = "am"


def _rf_decimation(rf_rate: float, channel_width: float, min_oversample: float = 2.0):
    """Largest integer decimation keeping quad rate >= min_oversample * cw
    (the role of rfLowPassDecimation selection in the reference apps)."""
    d = max(1, int(rf_rate // (min_oversample * channel_width)))
    return d


def _rational(from_rate: float, to_rate: float, limit: int = 1000) -> tuple[int, int]:
    fr = Fraction(to_rate / from_rate).limit_denominator(limit)
    return fr.numerator, fr.denominator


def fm_receiver(
    rf_sample_rate: float,
    freq_offset: float = 0.0,
    variant: str = WBFM,
    audio_rate: float = 48000.0,
    channel_width: float | None = None,
    deviation: float | None = None,
    deemphasis_tau: float | None = TAU_US,
    input_format: str = "cf32",
    db_attenuation: float = -60.0,
    fir_mode: str = "auto",
    use_fused: bool = False,
    multistage: bool = True,
) -> tuple[Chain, ReceiverSpec]:
    """Build a WBFM/NBFM receiver chain.

    ``freq_offset`` is the channel center relative to the capture center
    (the reference's tunedFrequency - channelFrequency oscillator,
    RfToPcmAudioFactory.cpp:224-226, sign folded into the NCO).

    ``use_fused=True`` replaces shift -> FIR -> demod with the single fused
    Pallas kernel (graph/blocks.py FusedFmDemod).

    ``multistage=True`` splits a large RF decimation into a spec-equivalent
    cascade (design.decimation_stages) — ~2-4x fewer MACs/input at D=50
    than the reference's single Fir stage (Fir.cpp), same band edges and
    stopband floor.
    """
    if channel_width is None:
        channel_width = WBFM_CHANNEL_WIDTH if variant == WBFM else NBFM_CHANNEL_WIDTH
    if deviation is None:
        deviation = WBFM_DEVIATION if variant == WBFM else NBFM_DEVIATION

    d1 = _rf_decimation(rf_sample_rate, channel_width)
    quad_rate = rf_sample_rate / d1

    # RF lowpass: pass the channel, stop at the channel edge (the
    # createLowPassTaps spec, RfToPcmAudioFactory.cpp:151-166 style).
    cutoff = channel_width / 2.0
    transition = channel_width / 2.0
    if multistage and not use_fused:
        rf_stages = design.decimation_stages(
            rf_sample_rate, cutoff, transition, db_attenuation, d1
        )
    else:
        rf_stages = [
            (design.lowpass_taps(rf_sample_rate, cutoff, transition, db_attenuation), d1)
        ]
    rf_taps = rf_stages[0][0]  # single-stage taps for the fused path

    gain = demod.quad_fm_demod_gain(quad_rate, channel_width)

    up, down = _rational(quad_rate, audio_rate)
    actual_audio = quad_rate * up / down

    blocks: list[tuple[str, object]] = []
    if input_format != "cf32":
        blocks.append(("iq", IqToComplex(input_format)))
    if use_fused:
        from tpusdr.graph.blocks import FusedFmDemod

        blocks.append(
            (
                "frontend",
                FusedFmDemod(
                    rf_sample_rate, -freq_offset, rf_taps, d1, gain
                ),
            )
        )
    else:
        if freq_offset:
            blocks.append(("shift", FreqShift(rf_sample_rate, -freq_offset)))
        if len(rf_stages) == 1:
            blocks.append(("rf_fir", Fir(rf_taps, d1, "FloatComplex", fir_mode)))
        else:
            for i, (t, d) in enumerate(rf_stages, 1):
                blocks.append((f"rf_fir{i}", Fir(t, d, "FloatComplex", fir_mode)))
        blocks.append(("demod", QuadFmDemod(gain=gain)))
    if deemphasis_tau:
        blocks.append(("deemph", Deemphasis(quad_rate, deemphasis_tau)))
    if (up, down) != (1, 1):
        blocks.append(("audio", Resampler(up, down, db_attenuation=db_attenuation)))

    chain = Chain(blocks)
    spec = ReceiverSpec(
        rf_sample_rate=rf_sample_rate,
        channel_width=channel_width,
        rf_decimation=d1,
        quad_rate=quad_rate,
        audio_rate=actual_audio,
        rf_taps=sum(len(t) for t, _ in rf_stages),
        resampler=(up, down),
        quad_gain=gain,
        rf_stages=tuple((len(t), d) for t, d in rf_stages),
    )
    log.info(
        "%s receiver: fs=%.3g, RF stages %s -> quad %.3g, "
        "audio %d/%d -> %.5g Hz",
        variant,
        rf_sample_rate,
        spec.rf_stages,
        quad_rate,
        up,
        down,
        actual_audio,
    )
    return chain, spec


def am_receiver(
    rf_sample_rate: float,
    freq_offset: float = 0.0,
    audio_rate: float = 48000.0,
    bandwidth: float = AM_BANDWIDTH,
    input_format: str = "cf32",
    db_attenuation: float = -60.0,
    fir_mode: str = "auto",
    audio_band: tuple[float, float] | None = None,
    multistage: bool = True,
) -> tuple[Chain, ReceiverSpec]:
    """AM envelope receiver (the am_test.cpp:435 chain: shift -> lowpass
    decim -> QuadAmDemod -> carrier-bias removal -> audio filtering).

    ``audio_band=(lo, hi)`` adds the band-pass audio shaping stage am_test
    builds with remezGenerateSingleBandPassTaps (am_test.cpp:151-195,
    createBandPassFilter :278-293)."""
    d1 = _rf_decimation(rf_sample_rate, bandwidth, min_oversample=4.0)
    quad_rate = rf_sample_rate / d1
    if multistage:
        rf_stages = design.decimation_stages(
            rf_sample_rate, bandwidth / 2.0, bandwidth / 2.0, db_attenuation, d1
        )
    else:
        rf_stages = [
            (
                design.lowpass_taps(
                    rf_sample_rate, bandwidth / 2.0, bandwidth / 2.0, db_attenuation
                ),
                d1,
            )
        ]
    up, down = _rational(quad_rate, audio_rate)

    blocks: list[tuple[str, object]] = []
    if input_format != "cf32":
        blocks.append(("iq", IqToComplex(input_format)))
    if freq_offset:
        blocks.append(("shift", FreqShift(rf_sample_rate, -freq_offset)))
    if len(rf_stages) == 1:
        blocks.append(("rf_fir", Fir(rf_stages[0][0], d1, "FloatComplex", fir_mode)))
    else:
        for i, (t, d) in enumerate(rf_stages, 1):
            blocks.append((f"rf_fir{i}", Fir(t, d, "FloatComplex", fir_mode)))
    blocks.append(("demod", QuadAmDemod()))
    # Strip the carrier level (the AddConstToVectorLength role in the
    # am_test chain) with a DC blocker — no carrier amplitude needed.
    blocks.append(("dc", DcBlock()))
    if audio_band is not None:
        lo, hi = audio_band
        bp = design.bandpass_taps(
            quad_rate, lo, hi, transition_width=lo, db_attenuation=db_attenuation
        )
        blocks.append(("audio_bp", Fir(bp, 1, "Float", fir_mode)))
    if (up, down) != (1, 1):
        blocks.append(("audio", Resampler(up, down, db_attenuation=db_attenuation)))

    chain = Chain(blocks)
    spec = ReceiverSpec(
        rf_sample_rate=rf_sample_rate,
        channel_width=bandwidth,
        rf_decimation=d1,
        quad_rate=quad_rate,
        audio_rate=quad_rate * up / down,
        rf_taps=sum(len(t) for t, _ in rf_stages),
        resampler=(up, down),
        quad_gain=1.0,
        rf_stages=tuple((len(t), d) for t, d in rf_stages),
    )
    return chain, spec


def rf_to_pcm(
    modulation: str,
    rf_sample_rate: float,
    tuned_frequency: float,
    channel_frequency: float,
    audio_rate: float = 48000.0,
    **kw,
) -> tuple[Chain, ReceiverSpec]:
    """Reference-API parity: IRfToPcmAudioFactory::createRfToPcm
    (FilterFactories.h:159-175) — modulation + tuned/channel frequencies."""
    offset = channel_frequency - tuned_frequency
    m = modulation.lower()
    if m in ("fm", "wbfm"):
        return fm_receiver(rf_sample_rate, offset, WBFM, audio_rate, **kw)
    if m == "nbfm":
        return fm_receiver(
            rf_sample_rate, offset, NBFM, audio_rate, deemphasis_tau=None, **kw
        )
    if m == "am":
        return am_receiver(rf_sample_rate, offset, audio_rate, **kw)
    raise ValueError(f"unknown modulation {modulation!r}")

"""Multi-channel receiver: PFB channelizer + batched per-channel demod.

The reference's multi-channel story is N independent graphs sharing one
source (/root/reference/src/applications/sdrtest.cpp:331-364).  Here one
polyphase channelizer splits the band once, and a single batched demod chain
processes all channels simultaneously (the channel axis is a leading batch
axis for every downstream op) — the flagship model for channel-axis mesh
sharding (BASELINE.md config 4, parallel/channels.py).
"""

from __future__ import annotations

from fractions import Fraction

from tpusdr.graph.blocks import Channelizer, Deemphasis, QuadFmDemod, Resampler
from tpusdr.graph.chain import Chain
from tpusdr.models.receiver import TAU_US, WBFM_DEVIATION
from tpusdr.ops import demod
from tpusdr.utils.logging import get_logger

log = get_logger("models")


def fm_channel_bank(
    rf_sample_rate: float,
    num_channels: int,
    audio_rate: float = 48000.0,
    deviation: float | None = None,
    deemphasis_tau: float | None = TAU_US,
    taps_per_channel: int = 12,
    db_attenuation: float = -60.0,
) -> tuple[Chain, dict]:
    """Channelize the band into ``num_channels`` and FM-demodulate each.

    Input: complex IQ at ``rf_sample_rate``; output: (num_channels, n_audio)
    float PCM.  Channel k sits at +k*fs/M (mod M).
    """
    m = num_channels
    chan_rate = rf_sample_rate / m
    channel_width = chan_rate  # maximally decimated: channel spacing = width
    if deviation is None:
        deviation = min(WBFM_DEVIATION, channel_width / 3.0)
    gain = demod.quad_fm_demod_gain(chan_rate, channel_width)

    fr = Fraction(audio_rate / chan_rate).limit_denominator(1000)
    up, down = fr.numerator, fr.denominator

    blocks: list[tuple[str, object]] = [
        (
            "channelizer",
            Channelizer(
                m, taps_per_channel=taps_per_channel, db_attenuation=db_attenuation
            ),
        ),
        ("demod", QuadFmDemod(gain=gain)),
    ]
    if deemphasis_tau:
        blocks.append(("deemph", Deemphasis(chan_rate, deemphasis_tau)))
    if (up, down) != (1, 1):
        blocks.append(("audio", Resampler(up, down, db_attenuation=db_attenuation)))

    chain = Chain(blocks)
    info = {
        "num_channels": m,
        "channel_rate": chan_rate,
        "audio_rate": chan_rate * up / down,
        "resampler": (up, down),
        "quad_gain": gain,
    }
    log.info(
        "fm channel bank: %d channels @ %.3g Hz each, audio %d/%d -> %.5g Hz",
        m,
        chan_rate,
        up,
        down,
        info["audio_rate"],
    )
    return chain, info

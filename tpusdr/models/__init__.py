"""tpusdr.models — complete receiver pipelines (the framework's "models").

The analog of the reference's composite pipeline factories + demod apps
(RfToPcmAudioFactory.cpp, nbfm_test.cpp, am_test.cpp,
145.45_digital_signal_to_audio.cpp, fm_simpletest.cpp): fully-designed
RF -> audio chains with automatic rate planning and tap design.
"""

from tpusdr.models.receiver import (  # noqa: F401
    AM,
    NBFM,
    WBFM,
    ReceiverSpec,
    am_receiver,
    fm_receiver,
    rf_to_pcm,
)
from tpusdr.models.multichannel import fm_channel_bank  # noqa: F401

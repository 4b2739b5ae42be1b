"""Host-side stream sinks.

The audio endpoint of the reference is AacFileWriter (FFmpeg AAC encode,
/root/reference/src/filters/AacFileWriter.cpp) — FFmpeg is outside DSP
scope (SURVEY.md section 2.9), so the native audio sink here is WAV/raw PCM
(with an optional ffmpeg-subprocess transcode left to the apps).
"""

from __future__ import annotations

import wave
from typing import List

import numpy as np


class WavSink:
    """Stream float32 PCM in [-1, 1] to a 16-bit WAV file."""

    def __init__(self, path: str, sample_rate: float, channels: int = 1):
        self.path = path
        self._wav = wave.open(path, "wb")
        self._wav.setnchannels(channels)
        self._wav.setsampwidth(2)
        self._wav.setframerate(int(round(sample_rate)))
        self.samples_written = 0

    def write(self, pcm: np.ndarray) -> None:
        x = np.asarray(pcm, dtype=np.float32)
        i16 = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
        self._wav.writeframes(i16.tobytes())
        self.samples_written += x.shape[-1]

    def close(self) -> None:
        self._wav.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RawFileSink:
    """Raw binary dump of each block (any dtype)."""

    def __init__(self, path: str, dtype=np.float32):
        self.path = path
        self.dtype = np.dtype(dtype)
        self._f = open(path, "wb")
        self.samples_written = 0

    def write(self, x: np.ndarray) -> None:
        arr = np.ascontiguousarray(np.asarray(x), dtype=self.dtype)
        self._f.write(arr.tobytes())
        self.samples_written += arr.shape[-1]

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class CollectSink:
    """Accumulate blocks in memory (tests, benches)."""

    def __init__(self):
        self.blocks: List[np.ndarray] = []
        self.samples_written = 0

    def write(self, x: np.ndarray) -> None:
        arr = np.asarray(x)
        self.blocks.append(arr)
        self.samples_written += arr.shape[-1]

    def result(self, axis: int = -1) -> np.ndarray:
        return np.concatenate(self.blocks, axis=axis)

    def close(self) -> None:
        pass


class NullSink:
    """Discard output, count samples (ReadByteCountMonitor role,
    /root/reference/src/filters/ReadByteCountMonitor.cpp:44-63 — the
    byte-count termination metric of the reference run loops)."""

    def __init__(self):
        self.samples_written = 0

    def write(self, x: np.ndarray) -> None:
        self.samples_written += np.asarray(x).shape[-1]

    def close(self) -> None:
        pass

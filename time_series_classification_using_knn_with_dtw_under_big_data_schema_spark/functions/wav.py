"""Minimal pure-stdlib WAV (RIFF/PCM16) codec — the audio twin of
functions/png.py: real audio decoding with no media libraries.

Scope: canonical RIFF WAVE, PCM (format 1), 16-bit signed little-endian,
mono or interleaved multi-channel (decoded to channel 0). Everything is
deterministic integer parsing, so decoded samples are oracle-checkable
when the payload is generated from a closed-form formula.
Spec: the public RIFF/WAVE format (Microsoft/IBM multimedia spec).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav_pcm16", "decode_wav_pcm16"]


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """1-D int16 array -> mono PCM16 WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise ValueError("encode_wav_pcm16 expects a 1-D int16 array")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (channel-0 samples int16 array, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    sample_rate = None
    n_channels = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length % 2)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, n_channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_code != 1:
                raise ValueError(f"unsupported WAV format code {fmt_code} (PCM only)")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits} (16-bit only)")
        elif tag == b"data":
            if n_channels is None:
                raise ValueError("WAV data chunk before fmt chunk")
            raw = np.frombuffer(body[: len(body) - len(body) % 2], dtype="<i2")
            samples = raw[::n_channels].copy() if n_channels > 1 else raw.copy()
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, sample_rate

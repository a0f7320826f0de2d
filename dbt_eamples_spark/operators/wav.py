"""Minimal pure-stdlib WAV/PCM codec (public spec: RIFF/WAVE,
Microsoft multimedia file format).

The multimodal decode seam (`multimodal.py`) proves its Arrow
plumbing with REAL decoders; this container ships no audio library,
so linear-PCM WAV is implemented here from the public specification
with struct + numpy only: RIFF/WAVE container, ``fmt `` chunk with
audio format 1 (integer PCM, 8 or 16 bit) or 3 (IEEE float32),
any channel count / sample rate, ``data`` chunk with the interleaved
frames. Compressed formats (ADPCM, MP3-in-WAV, A-law/mu-law) raise
``NotImplementedError`` — the librosa/soundfile integration point,
whose API this module mirrors (decode → (rate, channels, float array
in [-1, 1])).

Scale posture: identical to the PNG codec — runs INSIDE the Arrow
batch of a ``mapInPandas`` stage, per-task and streaming; metadata
filtering and frame sampling stay JVM-side so only payloads that
survive selection reach Python.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    data = bytes(data[:12])
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PCM WAV → ``(sample_rate, channels, samples)`` with
    ``samples`` shaped (n_frames, channels), dtype float64 in
    [-1, 1] (the librosa/soundfile convention): unsigned 8-bit is
    re-centered by 128, signed 16-bit divides by 32768, float32
    passes through."""
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        pos += 8
        chunk = data[pos : pos + length]
        pos += length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            audio_format, channels, rate, _byte_rate, _block, bits = (
                struct.unpack("<HHIIHH", chunk[:16])
            )
            fmt = (audio_format, channels, rate, bits)
        elif ctype == b"data":
            frames = chunk
    if fmt is None or frames is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, bits = fmt
    if audio_format == 1 and bits == 8:
        x = np.frombuffer(frames, np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif audio_format == 1 and bits == 16:
        n = len(frames) - (len(frames) % 2)
        x = np.frombuffer(frames[:n], "<i2").astype(np.float64) / 32768.0
    elif audio_format == 3 and bits == 32:
        n = len(frames) - (len(frames) % 4)
        x = np.frombuffer(frames[:n], "<f4").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format}/{bits}-bit (only integer "
            "PCM 8/16 and float32); compressed audio requires "
            "librosa/soundfile — integrate here"
        )
    n_frames = len(x) // channels
    return rate, channels, x[: n_frames * channels].reshape(-1, channels)


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16
) -> bytes:
    """Encode float samples in [-1, 1] (shape (n_frames,) or
    (n_frames, channels)) as an integer-PCM WAV — the test-side
    twin of :func:`decode_wav`."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    channels = x.shape[1]
    if bits == 16:
        pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    elif bits == 8:
        pcm = np.clip(np.round(x * 128.0 + 128.0), 0, 255).astype(np.uint8)
    else:
        raise NotImplementedError(f"{bits}-bit encode (only 8/16)")
    frames = pcm.tobytes()
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(frames))
        + frames
        + (b"\x00" if len(frames) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body

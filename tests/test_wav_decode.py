"""Real WAV/PCM decode behind the multimodal strict seam (engine
component C4): pure-stdlib codec roundtrips, format gating, and the
strict Arrow stage extracting audio features from REAL WAV bytes."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import types as T

from dbt_eamples_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features_frame,
)
from dbt_eamples_spark.operators.wav import decode_wav, encode_wav, is_wav


class TestWavCodec:
    def test_roundtrip_16bit_stereo(self):
        t = np.linspace(0, 1, 8000, endpoint=False)
        left = 0.5 * np.sin(2 * np.pi * 440 * t)
        right = 0.25 * np.sin(2 * np.pi * 880 * t)
        x = np.stack([left, right], axis=1)
        rate, channels, y = decode_wav(encode_wav(x, 8000, bits=16))
        assert (rate, channels) == (8000, 2)
        assert y.shape == x.shape
        # 16-bit quantization: within half a step of the original
        assert np.abs(y - x).max() <= 1.0 / 32768.0

    def test_roundtrip_8bit_mono(self):
        x = np.linspace(-1, 1, 256)
        rate, channels, y = decode_wav(encode_wav(x, 44100, bits=8))
        assert (rate, channels) == (44100, 1)
        assert np.abs(y[:, 0] - x).max() <= 1.0 / 128.0

    def test_float32_format_decodes(self):
        x = np.array([0.0, 0.5, -0.5, 1.0], dtype="<f4")
        fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
        frames = x.tobytes()
        body = (
            b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames
        )
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        rate, channels, y = decode_wav(data)
        assert rate == 16000 and channels == 1
        assert y[:, 0] == pytest.approx([0.0, 0.5, -0.5, 1.0])

    def test_compressed_format_raises_at_integration_point(self):
        fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # ADPCM
        body = (
            b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4
        )
        data = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(NotImplementedError, match="librosa"):
            decode_wav(data)

    def test_is_wav_rejects_other_magic(self):
        assert not is_wav(b"\x89PNG\r\n\x1a\n")
        assert not is_wav(b"RIFF....AVI LIST")
        assert is_wav(encode_wav(np.zeros(4), 8000))

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 200),
        channels=st.integers(1, 4),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_property_roundtrip_any_signal(self, n, channels, rate, seed):
        rng = np.random.default_rng(seed)
        x = rng.uniform(-0.999, 0.999, size=(n, channels))
        r, c, y = decode_wav(encode_wav(x, rate, bits=16))
        assert (r, c, y.shape) == (rate, channels, x.shape)
        assert np.abs(y - x).max() <= 1.0 / 32768.0


class TestStrictAudioThroughSpark:
    def test_strict_mode_extracts_audio_features(self, spark):
        """The full Arrow plumbing with REAL audio bytes: a 440 Hz
        sine and pure silence, mixed with a PNG image in the same
        batch (the magic-byte dispatch)."""
        from dbt_eamples_spark.operators.png import encode_png

        t = np.linspace(0, 1, 8000, endpoint=False)
        sine = 0.5 * np.sin(2 * np.pi * 440 * t)
        silence = np.zeros(4000)
        img = np.full((4, 4, 3), 255, dtype=np.uint8)
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        )
        bt = spark.createDataFrame(
            [
                (1, bytearray(encode_wav(sine, 8000))),
                (2, bytearray(encode_wav(silence, 8000))),
                (3, bytearray(encode_png(img))),
            ],
            schema=schema,
        )
        out = {
            r["doc_id"]: r["features"]
            for r in decode_features_frame(bt, "strict").collect()
        }
        assert len(out) == 3

        f = out[1]
        assert len(f) == FEATURE_DIM
        assert f[0] == 8000.0  # sample rate
        assert f[1] == 8000.0  # frames
        assert f[2] == 1.0     # channels
        assert f[3] == pytest.approx(1.0)  # duration
        # sine RMS = amp/sqrt(2), peak ~ amp, ZCR ~ 2*freq/rate
        assert f[4] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
        assert f[5] == pytest.approx(0.5, rel=1e-3)
        assert f[6] == pytest.approx(880 / 8000, rel=0.01)
        assert abs(f[7]) < 1e-3  # no DC offset

        s = out[2]
        assert s[4] == 0.0 and s[5] == 0.0  # silence: zero RMS/peak

        assert out[3][0:3] == [4.0, 4.0, 3.0]  # the PNG went image-path

"""GIF codec behind the strict multimodal seam (VERDICT r5 #7):
LZW + color table decode with hermetic fixtures from the module's
own encoder — the png/jpeg/wav encoder-for-fixtures pattern."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import types as T

from dbt_eamples_spark.operators.gif import (
    decode_gif,
    encode_gif_indexed,
    is_gif,
)
from dbt_eamples_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features_frame,
)


def _grid(h: int, w: int, n_colors: int, seed: int = 0) -> np.ndarray:
    """Deterministic md5-driven index grid (no RNG state)."""
    flat = [
        hashlib.md5(f"{seed}:{i}".encode()).digest()[0] % n_colors
        for i in range(h * w)
    ]
    return np.array(flat, np.uint8).reshape(h, w)


def _palette(n: int) -> np.ndarray:
    return np.array(
        [
            [
                hashlib.md5(f"pal:{i}:{c}".encode()).digest()[0]
                for c in range(3)
            ]
            for i in range(n)
        ],
        np.uint8,
    )


class TestRoundTrip:
    def test_indexed_roundtrip_exact(self):
        pal, idx = _palette(16), _grid(13, 29, 16)
        w, h, ch, px = decode_gif(encode_gif_indexed(pal, idx))
        assert (w, h, ch) == (29, 13, 3)
        assert np.array_equal(px, pal[idx])

    def test_two_color_min_code_floor(self):
        # 2-color palettes still use min LZW code size 2 (spec floor)
        pal, idx = _palette(2), _grid(9, 7, 2, seed=3)
        w, h, ch, px = decode_gif(encode_gif_indexed(pal, idx))
        assert (w, h, ch) == (7, 9, 3)
        assert np.array_equal(px, pal[idx])

    def test_interlaced_equals_progressive_scan(self):
        pal, idx = _palette(8), _grid(21, 17, 8, seed=1)
        plain = decode_gif(encode_gif_indexed(pal, idx))[3]
        laced = decode_gif(
            encode_gif_indexed(pal, idx, interlace=True)
        )[3]
        assert np.array_equal(laced, plain)

    def test_transparency_promotes_to_rgba(self):
        pal, idx = _palette(4), _grid(10, 10, 4, seed=2)
        w, h, ch, px = decode_gif(
            encode_gif_indexed(pal, idx, transparent=1)
        )
        assert ch == 4 and px.shape == (10, 10, 4)
        assert np.array_equal(px[..., :3], pal[idx])
        assert np.array_equal(
            px[..., 3], np.where(idx == 1, 0, 255).astype(np.uint8)
        )

    def test_lzw_dict_overflow_resets_cleanly(self):
        # 160x160 of 64-color noise exceeds the 4096-code dictionary
        # several times over — exercises the CLEAR/reset path on both
        # encoder and decoder
        pal, idx = _palette(64), _grid(160, 160, 64, seed=4)
        _, _, _, px = decode_gif(encode_gif_indexed(pal, idx))
        assert np.array_equal(px, pal[idx])


class TestProfileEdges:
    def test_rejects_non_gif(self):
        with pytest.raises(ValueError):
            decode_gif(b"\x89PNG not a gif")

    def test_unknown_block_raises_at_seam(self):
        data = bytearray(encode_gif_indexed(_palette(4), _grid(4, 4, 4)))
        i = data.index(0x2C, 13)  # corrupt the image separator
        data[i] = 0x7E
        with pytest.raises(NotImplementedError, match="0x7e"):
            decode_gif(bytes(data))

    def test_is_gif_both_versions(self):
        assert is_gif(b"GIF89a" + b"\x00" * 7)
        assert is_gif(b"GIF87a" + b"\x00" * 7)
        assert not is_gif(b"GIF90a" + b"\x00" * 7)


class TestStrictSeam:
    def test_strict_stage_decodes_gif_payload(self, spark):
        pal, idx = _palette(16), _grid(24, 32, 16, seed=5)
        rows = [
            (1, bytearray(encode_gif_indexed(pal, idx))),
            (2, bytearray(encode_gif_indexed(pal, idx, transparent=0))),
        ]
        bt = spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("content", T.BinaryType()),
                ]
            ),
        )
        out = {
            r["doc_id"]: r
            for r in decode_features_frame(bt, decode_stub="strict").collect()
        }
        assert len(out) == 2
        for doc_id, ch in ((1, 3.0), (2, 4.0)):
            feats = out[doc_id]["features"]
            assert len(feats) == FEATURE_DIM
            assert feats[:3] == [32.0, 24.0, ch]
            assert 0.0 < feats[3] < 1.0

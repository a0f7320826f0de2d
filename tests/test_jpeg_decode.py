"""Baseline + progressive JPEG decode behind the multimodal strict seam (VERDICT
r4 missing #1): the pure-numpy baseline codec roundtrips grayscale
and RGB within the quantizer's error bound, interops canonically
(standard Annex K Huffman tables decode too), and the strict
``mapInPandas`` stage decodes a generated JPEG payload end-to-end
without NotImplementedError."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from dbt_eamples_spark.operators.jpeg import (
    _magnitude,
    _extend,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)
from dbt_eamples_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features_frame,
)


def _smooth(h: int, w: int, seed: int = 3) -> np.ndarray:
    """JPEG-friendly smooth gradient + mild noise."""
    rng = np.random.RandomState(seed)
    base = np.add.outer(
        np.linspace(0, 255, h), np.linspace(0, 255, w)
    ) / 2
    return np.clip(base + rng.randint(-6, 7, (h, w)), 0, 255).astype(
        np.uint8
    )


class TestCodecRoundtrip:
    def test_grayscale_error_bounded(self):
        px = _smooth(48, 64)
        data = encode_jpeg(px)
        assert is_jpeg(data)
        w, h, ch, out = decode_jpeg(data)
        assert (w, h, ch) == (64, 48, 1)
        err = np.abs(out[:, :, 0].astype(int) - px.astype(int))
        assert err.mean() < 6 and err.max() < 40

    def test_rgb_error_bounded(self):
        g = _smooth(40, 56, seed=9)
        px = np.stack([g, 255 - g, np.roll(g, 5, axis=1)], axis=2)
        data = encode_jpeg(px)
        w, h, ch, out = decode_jpeg(data)
        assert (w, h, ch) == (56, 40, 3)
        err = np.abs(out.astype(int) - px.astype(int))
        assert err.mean() < 8

    def test_odd_dimensions_and_flat_color(self):
        # flat color survives quantization EXACTLY (DC-only blocks)
        px = np.full((13, 29, 3), 128, dtype=np.uint8)
        w, h, ch, out = decode_jpeg(encode_jpeg(px))
        assert (w, h, ch) == (29, 13, 3)
        assert int(np.abs(out.astype(int) - 128).max()) <= 1

    def test_magnitude_extend_inverse(self):
        for v in range(-1024, 1025):
            ssss, bits = _magnitude(v)
            assert _extend(bits, ssss) == v

    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG\r\n\x1a\n garbage")

    def test_arithmetic_marker_raises(self):
        px = _smooth(16, 16)
        data = bytearray(encode_jpeg(px))
        i = data.find(b"\xff\xc0")
        data[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic)
        with pytest.raises(NotImplementedError, match="SOF9"):
            decode_jpeg(bytes(data))

    def test_standalone_markers_and_fill_bytes(self):
        """Conforming streams may pad with 0xFF fill bytes before a
        marker and carry standalone TEM (0x01) markers with no
        length field (T.81 B.1.1.2); both must be skipped, not
        parsed as a marker-with-length (ADVICE r5)."""
        px = _smooth(16, 16)
        clean = encode_jpeg(px)
        _, _, _, want = decode_jpeg(clean)
        i = clean.find(b"\xff\xc0")  # splice just before SOF0
        padded = clean[:i] + b"\xff\xff\xff\x01\xff" + clean[i:]
        w, h, ch, got = decode_jpeg(padded)
        assert (w, h, ch) == (16, 16, 1 if px.ndim == 2 else 3)
        assert np.array_equal(got, want)


    def test_trailing_fill_bytes_raise_value_error(self):
        """A stream that ENDS inside 0xFF padding has no marker byte
        left; that must be the documented ValueError for malformed
        streams, not an IndexError (ADVICE r6)."""
        with pytest.raises(ValueError, match="truncated"):
            decode_jpeg(b"\xff\xd8\xff\xff")


class TestStandardTableInterop:
    def test_annex_k_huffman_tables_decode(self):
        """A scan re-encoded with the STANDARD Annex K luminance DC
        table (different BITS spec than our per-image tables) must
        decode — the decoder is generic canonical Huffman, not tied
        to the encoder's table builder."""
        from dbt_eamples_spark.operators.jpeg import (
            _BitReader,
            _BitWriter,
            _HuffDecoder,
            _canonical_codes,
        )

        bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
        vals = list(range(12))
        codes = _canonical_codes(bits, vals)
        bw = _BitWriter()
        seq = [0, 3, 7, 11, 1, 2]
        for s in seq:
            c, ln = codes[s]
            bw.write(c, ln)
        payload = bw.flush()
        dec = _HuffDecoder(bits, vals)
        br = _BitReader(payload + b"\xff\xd9", 0)
        assert [dec.decode(br) for _ in seq] == seq


class TestStrictSeam:
    def test_strict_stage_decodes_jpeg_payload(self, spark):
        px = _smooth(24, 32, seed=5)
        rgb = np.stack([px, px, 255 - px], axis=2)
        rows = [
            (1, bytearray(encode_jpeg(rgb))),
            (2, bytearray(encode_jpeg(px))),
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
        for doc_id, (w, h, ch) in ((1, (32, 24, 3)), (2, (32, 24, 1))):
            feats = out[doc_id]["features"]
            assert len(feats) == FEATURE_DIM
            assert feats[:3] == [float(w), float(h), float(ch)]
            assert 0.0 < feats[3] < 1.0  # mean brightness

    def test_mixed_png_jpeg_wav_batch(self, spark):
        from dbt_eamples_spark.operators.png import encode_png
        from dbt_eamples_spark.operators.wav import encode_wav

        px = _smooth(8, 8)
        rows = [
            (1, bytearray(encode_jpeg(px))),
            (2, bytearray(encode_png(px))),
            (
                3,
                bytearray(encode_wav(np.zeros((100, 1)), 8000)),
            ),
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
        got = decode_features_frame(bt, decode_stub="strict").collect()
        assert {r["doc_id"] for r in got} == {1, 2, 3}

    def test_codec_stats_matches_generative_formula(self, spark):
        """multimodal_codec_stats' Spark side (encode → strict
        decode → features) must equal the closed form the oracle
        computes — checked here in pure python for a few doc_ids of
        each kind (the driver row re-checks via DuckDB)."""
        from dbt_eamples_spark.operators.multimodal import (
            _codec_payload_batch,
            _strict_decode,
        )
        import pandas as pd

        batch = _codec_payload_batch(
            pd.DataFrame({"doc_id": [3, 9, 1, 7, 2, 11]})
        )
        feats = {
            r.doc_id: r.features
            for r in _strict_decode(batch).itertuples()
        }
        for d in (3, 9):  # PNG
            vals = [(d * 31 + i) % 256 for i in range(64)]
            f = feats[d]
            assert f[:3] == [8.0, 8.0, 1.0]
            assert abs(f[3] - sum(vals) / 64 / 255) < 1e-12
            assert f[7] == sum(v > 127 for v in vals) / 64
        for d in (1, 7):  # GIF
            vals = [85 * ((d + i) % 4) for i in range(64)]
            f = feats[d]
            assert f[:3] == [8.0, 8.0, 3.0]
            assert abs(f[3] - sum(vals) / 64 / 255) < 1e-12
            assert f[4] == f[5] == f[6]
        for d in (2, 11):  # WAV
            ks = [((d * 7 + i * 13) % 2001) - 1000 for i in range(64)]
            pcm = [min(round(k / 1000.0 * 32768.0), 32767) for k in ks]
            mono = [p / 32768.0 for p in pcm]
            f = feats[d]
            assert f[:4] == [8000.0, 64.0, 1.0, 64 / 8000]
            assert abs(f[7] - sum(mono) / 64) < 1e-15


class TestProgressive:
    """SOF2 multi-scan decode: the progressive stream quantizes
    IDENTICALLY to the baseline one, so progressive decode must be
    BIT-IDENTICAL to baseline decode of the same pixels — the
    strongest cross-profile check available without an external
    library."""

    def _color(self, h, w, seed=9):
        rng = np.random.RandomState(seed)
        base = rng.randint(0, 256, size=(5, 5, 3)).astype(np.float64)
        big = np.kron(base, np.ones((16, 16, 1)))
        return np.clip(
            big[:h, :w] + rng.randn(h, w, 3) * 8, 0, 255
        ).astype(np.uint8)

    @pytest.mark.parametrize("al", [0, 1, 2])
    def test_matches_baseline_bit_for_bit_gray(self, al):
        from dbt_eamples_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        px = _smooth(41, 26, seed=al)
        want = decode_jpeg(encode_jpeg(px))
        data = encode_jpeg_progressive(px, al=al)
        assert data[2:4] != b"\xff\xc0" and b"\xff\xc2" in data[:200]
        got = decode_jpeg(data)
        assert got[:3] == want[:3]
        np.testing.assert_array_equal(got[3], want[3])

    @pytest.mark.parametrize("al", [0, 1, 2])
    def test_matches_baseline_bit_for_bit_color(self, al):
        from dbt_eamples_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        px = self._color(33, 40, seed=al + 1)
        want = decode_jpeg(encode_jpeg(px))
        got = decode_jpeg(encode_jpeg_progressive(px, al=al))
        assert got[:3] == want[:3]
        np.testing.assert_array_equal(got[3], want[3])

    def test_noise_stresses_zrl_and_eob_paths(self):
        from dbt_eamples_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        rng = np.random.RandomState(2)
        px = rng.randint(0, 256, size=(32, 24, 3), dtype=np.uint8)
        want = decode_jpeg(encode_jpeg(px))
        for al in (0, 1, 2):
            got = decode_jpeg(encode_jpeg_progressive(px, al=al))
            np.testing.assert_array_equal(got[3], want[3])

    def test_scan_count_matches_script(self):
        from dbt_eamples_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        px = self._color(16, 16)
        # al=1 color: 1 DC + 6 AC first + (1 DC + 6 AC) refine = 14
        data = encode_jpeg_progressive(px, al=1)
        assert data.count(b"\xff\xda") == 14
        # al=0 color: 1 DC + 6 AC band scans, no refinement
        assert encode_jpeg_progressive(px, al=0).count(b"\xff\xda") == 7

    def test_progressive_through_strict_multimodal_stage(self, spark):
        from dbt_eamples_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        px = self._color(24, 24)
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("content", T.BinaryType()),
            ]
        )
        bt = spark.createDataFrame(
            [(1, bytearray(encode_jpeg_progressive(px, al=1)))], schema
        )
        rows = decode_features_frame(bt, decode_stub="strict").collect()
        assert len(rows) == 1
        f = rows[0]["features"]
        assert len(f) == FEATURE_DIM
        assert f[0:3] == [24.0, 24.0, 3.0]

"""Multimodal column plumbing (SURVEY.md §2.11 X5).

Images/audio/video are opaque ``binary`` columns plus a typed
metadata struct. The decode/feature-extraction step is a Pandas-UDF
stage over ``mapInPandas`` — the Spark-side plumbing (schema,
batching, partitioning) is real and tested; the actual media decode
is STUBBED (the image/audio libraries are not in this container):
``decode_stub='fake'`` produces a deterministic fake feature vector
from the bytes, ``decode_stub='strict'`` raises NotImplementedError
exactly where a real decoder (PIL/librosa/av) would plug in.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of corpus size; binary payloads never pass through
the driver; metadata extraction (sizes, magic, hashes) stays in
JVM built-ins so filtering/pruning on metadata happens before any
Python stage.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from dbt_eamples_spark.catalog import load_table

FEATURE_DIM = 8

_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multimodal stand-in: the documents table with
    its text encoded as a binary payload + typed metadata struct —
    the exact shape ``spark.read.format('binaryFile')`` yields."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.length(F.col("text")).cast("long").alias("n_chars"),
            F.lit("text/plain").alias("mime"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata pass over binary columns — JVM-side only (size,
    content hash, mime): what you filter on BEFORE any Python
    decode stage touches bytes."""
    bt = binary_table(spark, sf_dir)
    return bt.select(
        "doc_id",
        F.octet_length("content").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.origin").alias("origin"),
    )


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake 'decode': FEATURE_DIM byte-histogram
    moments. Stands in for image resize / audio frame sampling."""
    out = []
    for doc_id, content in zip(batch["doc_id"], batch["content"]):
        b = bytes(content)
        feats = []
        for d in range(FEATURE_DIM):
            sl = b[d::FEATURE_DIM]
            # floor-truncate at 6dp (not round): unambiguous across
            # engines, so the DuckDB oracle reproduces it exactly
            x = sum(sl) / max(len(sl), 1) / 255.0
            feats.append(math.floor(x * 1e6) / 1e6)
        out.append({"doc_id": doc_id, "n_bytes": len(b), "features": feats})
    return pd.DataFrame(out, columns=["doc_id", "n_bytes", "features"])


def multimodal_decode_features(
    spark: SparkSession, sf_dir: str, decode_stub: str = "fake"
) -> DataFrame:
    """Arrow-batched decode/feature-extract stage over mapInPandas.

    ``decode_stub='strict'`` raises NotImplementedError at the point
    a real decoder integrates (PIL.Image.open / librosa.load /
    av.open) — the surrounding plumbing is production-shaped.
    """
    bt = binary_table(spark, sf_dir).select("doc_id", "content")

    if decode_stub == "strict":
        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "real media decode requires PIL/librosa/av; "
                "use decode_stub='fake' for the deterministic stand-in"
            )
    else:
        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for batch in batches:
                if len(batch):
                    yield _fake_decode(batch)

    return bt.mapInPandas(decode, schema=_FEATURE_SCHEMA)


def multimodal_features_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: decoded feature vectors flattened to
    scalar columns (first two moments) so the oracle can check the
    plumbing end-to-end without array-float hashing."""
    feats = multimodal_decode_features(spark, sf_dir, decode_stub="fake")
    return feats.select(
        "doc_id",
        "n_bytes",
        F.element_at("features", 1).alias("feat_0"),
        F.element_at("features", 2).alias("feat_1"),
    )


FRAME_BYTES = 16   # bytes per "frame" of the payload
FRAME_STRIDE = 4   # keep every 4th frame


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads — the video-ingest shape:
    chunk the payload into fixed FRAME_BYTES frames, keep every
    FRAME_STRIDE-th frame, fingerprint each kept frame. Entirely
    JVM-side (hex → substring → md5): frame selection and hashing
    need no Python, so a real pipeline only pays the Arrow hop for
    frames that SURVIVE sampling (this stage feeds
    multimodal_decode_features, it doesn't replace it).

    Portability: frames are cut from the hex encoding (2 chars per
    byte) because DuckDB has no byte-substring on BLOB — hex is 1-1
    with bytes, so hashing the hex slice fingerprints the frame
    exactly. The hex string materializes in its own projection below
    the explode so it's computed once per doc, not once per frame.
    Tail bytes short of a full frame are dropped (n_frames = floor),
    matching fixed-size video frame buffers."""
    bt = binary_table(spark, sf_dir).select("doc_id", "content")
    base = bt.select(
        "doc_id",
        F.hex("content").alias("h"),
        F.floor(F.octet_length("content") / F.lit(FRAME_BYTES))
        .cast("long")
        .alias("n_frames"),
    )
    ids = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)))
    return (
        base.select(
            "doc_id", "h", "n_frames", F.explode_outer(ids).alias("frame_idx")
        )
        .filter(
            (F.col("frame_idx") < F.col("n_frames"))
            & (F.col("frame_idx") % FRAME_STRIDE == 0)
        )
        .select(
            "doc_id",
            "frame_idx",
            "n_frames",
            F.md5(
                F.substring(
                    F.col("h"),
                    (F.col("frame_idx") * (2 * FRAME_BYTES) + 1).cast("int"),
                    2 * FRAME_BYTES,
                )
            ).alias("frame_md5"),
        )
    )

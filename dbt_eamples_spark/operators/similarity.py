"""Similarity search over the ``embeddings`` table (SURVEY.md §2.11
X3; BASELINE.json north-star: ANN over an array<float> column).

Two tiers, mirroring how a production pipeline scales:

 - ``similarity_topk``: brute-force cosine top-k — the exact
   baseline. The query set is broadcast; the big side streams once;
   per-partition top-k via window. Cost O(|Q|·N) but one scan, no
   shuffle of the corpus (the window partitions by query id, so the
   shuffle is |Q|·N rows of (id, id, score) — the scored pairs, not
   the vectors).
 - ``similarity_ivf_topk``: IVF-style two-stage search — assign all
   vectors to their nearest centroid (broadcast centroids), probe
   only the ``NPROBE`` nearest centroid buckets per query. At 100 TB
   this turns O(|Q|·N) into O(|Q|·N/k·nprobe) and the bucket
   assignment is a narrow map. Centroids here are a deterministic
   seed subset (vec_id < NCENTROIDS) standing in for k-means output;
   swapping in trained centroids changes numbers, not the plan.

All arithmetic is higher-order array functions (zip_with/aggregate)
— strict left folds, JVM-side, which both stays in codegen and makes
results bit-reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table

N_QUERIES = 10  # query set: vec_id < 10
TOP_K = 5
NCENTROIDS = 8
NPROBE = 2


def _as_double_vec(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Two-phase top-k per query_id.

    Phase 1 reduces each input partition to its local top-k per
    query (groupBy on (query_id, partition-id) aggregates map-side —
    no full-width shuffle), phase 2 ranks the surviving
    |Q|·partitions·k rows with the exact window. Equivalent to a
    single window (ties fully broken by neighbor_id) but avoids
    funneling |Q|·N scored rows into |Q| window tasks at scale.
    """
    local = (
        scored.withColumn("_pid", F.spark_partition_id())
        .groupBy("query_id", "_pid")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct(F.col("cosine"), F.col("neighbor_id"))),
                    # descending cosine, ascending neighbor_id on ties
                    lambda a, b: F.when(a.cosine > b.cosine, -1)
                    .when(a.cosine < b.cosine, 1)
                    .when(a.neighbor_id < b.neighbor_id, -1)
                    .when(a.neighbor_id > b.neighbor_id, 1)
                    .otherwise(0),
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.explode_outer("top").alias("t"))
        .select("query_id", F.col("t.neighbor_id").alias("neighbor_id"),
                F.col("t.cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        local.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: for each query vector (vec_id <
    N_QUERIES), the TOP_K nearest other vectors."""
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True).select(
        "vec_id", _as_double_vec(F.col("embedding")).alias("vec")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine(F.col("qvec"), F.col("vec")), 6).alias("cosine"),
        )
    )
    return _topk(scored, TOP_K)


def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed top-k: assign → probe NPROBE buckets → rank.

    Only vectors whose centroid is among the query's NPROBE nearest
    centroids are scored — the recall/cost dial of a real IVF index.
    """
    emb = load_table(spark, sf_dir, "embeddings", parallelize=True).select(
        "vec_id", _as_double_vec(F.col("embedding")).alias("vec")
    )
    cent = emb.filter(F.col("vec_id") < NCENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("vec").alias("cvec")
    )

    # nearest-centroid assignment for every vector (broadcast cents)
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cent_cos"), F.asc("cent_id")
    )
    assigned = (
        emb.join(F.broadcast(cent), how="cross")
        .select(
            "vec_id",
            "vec",
            "cent_id",
            _cosine(F.col("vec"), F.col("cvec")).alias("cent_cos"),
        )
        .withColumn("crk", F.row_number().over(w_assign))
        .filter(F.col("crk") == 1)
        .select("vec_id", "vec", F.col("cent_id").alias("bucket"))
    )

    # per-query probe list: NPROBE nearest centroids
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("probe_cos"), F.asc("cent_id")
    )
    probes = (
        q.join(F.broadcast(cent), how="cross")
        .select(
            "query_id",
            "qvec",
            "cent_id",
            _cosine(F.col("qvec"), F.col("cvec")).alias("probe_cos"),
        )
        .withColumn("prk", F.row_number().over(w_probe))
        .filter(F.col("prk") <= NPROBE)
        .select("query_id", "qvec", F.col("cent_id").alias("bucket"))
    )

    # search only the probed buckets
    scored = (
        assigned.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_cosine(F.col("qvec"), F.col("vec")), 6).alias("cosine"),
        )
    )
    return _topk(scored, TOP_K)

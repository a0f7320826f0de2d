"""Bloom-filter semi-join prefiltering (SURVEY.md §2.3 join family,
100 TB posture).

The reference pushes every join to the warehouse
(`/root/reference/dbt_query.py:29-96` compiles metric joins;
`connections.py` executes them verbatim) — at warehouse scale the
engine's runtime filters do the fact-side pruning invisibly. Spark
has the same machinery for JOINS IT PLANS ITSELF
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but a
PIPELINE — where the dim keys are computed in one job and the fact
scanned in another, or where the fact is consumed by something other
than a join — needs the explicit form: build a compact bloom from
the key set, prefilter the fact with pure JVM expressions, then
exact-verify the survivors.

Design (public Bloom-filter construction, Bloom 1970):
 - ``M_BITS``-bit filter as ``M_BITS/64`` packed int64 words;
 - ``K_HASHES`` probes per key via ``xxhash64(key, seed)`` — Spark's
   built-in 64-bit hash, evaluated whole-stage-codegen;
 - build = one map-side-combined ``bit_or`` aggregate to ≤ M/64
   rows, collected driver-side (BOUNDED BY CONSTRUCTION at 8 KiB —
   independent of dim cardinality, unlike collecting the keys);
 - probe = the words travel as an array LITERAL inside the fact
   filter: zero joins, zero shuffles, zero Python — the membership
   test inlines next to the parquet scan, so at 100 TB the fact
   rows that fail the bloom die in the scan stage without ever
   reaching the exchange.

False positives (~0.1% at 6k keys / 64 Kbit / 3 hashes) are removed
by the exact semi join AFTER the prefilter, so results are exactly
the plain semi join's — the bloom only shrinks the join's input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table

M_BITS = 1 << 16  # filter size: 64 Kbit = 1024 words = 8 KiB
K_HASHES = 3
_WORDS = M_BITS // 64


def _positions(key: Column) -> list[Column]:
    """K bit positions for a key — xxhash64 with distinct seeds,
    folded into [0, M_BITS)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(M_BITS))
        for seed in range(K_HASHES)
    ]


def bloom_build(keys: DataFrame, key_col: str) -> list[int]:
    """Aggregate the key set into packed filter words. One shuffle
    to ≤ M/64 rows (bit_or partials combine map-side), then a
    bounded collect of at most ``_WORDS`` (word, bits) rows.

    ``shiftleft`` with a COLUMN shift count only exists in SQL form
    (the Python API pins numBits to a literal int), hence the expr.
    """
    pos = F.explode(F.array(*_positions(F.col(key_col)))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )
    packed = [0] * _WORDS
    for r in words:
        packed[int(r["word"])] = int(r["bits"])
    return packed


def bloom_might_contain(packed: list[int], key_expr: str) -> Column:
    """Membership predicate over the packed words as an array
    literal — pure JVM expressions, codegen-friendly, no join.
    ``key_expr`` is a SQL expression string naming the key column
    (the probes need column-valued shift counts, SQL-only)."""
    arr_sql = "array(" + ",".join(f"{w}L" for w in packed) + ")"
    probes = []
    for seed in range(K_HASHES):
        pos = f"pmod(xxhash64({key_expr}, {seed}), {M_BITS})"
        word = f"element_at({arr_sql}, CAST({pos} / 64 AS INT) + 1)"
        bit = f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))"
        probes.append(f"({word} & {bit}) != 0")
    return F.expr(" AND ".join(probes))


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue and order count per order priority for customers in
    the BUILDING market segment — computed as bloom-prefiltered
    exact semi join: the fact scan keeps only rows whose custkey
    passes the 8 KiB bloom built from the segment's customers, then
    the survivors (true matches + ~0.1% false positives) are
    exact-verified against the key set. Result is IDENTICAL to the
    plain semi join (the oracle), with the fact-side exchange fed
    ~segment-fraction of the table instead of all of it."""
    cust = load_table(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    packed = bloom_build(keys, "c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    candidates = orders.filter(bloom_might_contain(packed, "o_custkey"))
    verified = candidates.join(
        F.broadcast(keys),
        candidates["o_custkey"] == keys["c_custkey"],
        "left_semi",
    )
    return verified.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "revenue_cents"
        ),
    )

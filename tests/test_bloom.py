"""Bloom-prefilter join: the prefilter must PRUNE (candidates ≪
fact) while never losing a true match (no false negatives — the
Bloom guarantee), and the exact verify must leave results identical
to the plain semi join."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    join_bloom_prefilter,
)

SF = "/root/testdata/sf0.01"


class TestBloomMechanics:
    def test_no_false_negatives_and_prunes(self, spark):
        cust = load_table(spark, SF, "customer")
        keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
            "c_custkey"
        )
        packed = bloom_build(keys, "c_custkey")
        orders = load_table(spark, SF, "orders")
        n_fact = orders.count()
        candidates = orders.filter(bloom_might_contain(packed, "o_custkey"))
        n_cand = candidates.count()
        n_true = orders.join(
            F.broadcast(keys),
            orders["o_custkey"] == keys["c_custkey"],
            "left_semi",
        ).count()
        # every true match survives the bloom ...
        assert n_cand >= n_true
        # ... and the prefilter did real work: candidates are close
        # to the true-match count, far below the full fact (BUILDING
        # is one of 5 segments ⇒ ~20% of orders; 0.1% fp budget)
        assert n_cand < n_fact * 0.5
        assert n_cand <= int(n_true * 1.05) + 10

    def test_member_keys_always_pass(self, spark):
        keys = spark.range(1, 200).withColumnRenamed("id", "k")
        packed = bloom_build(keys, "k")
        survivors = keys.filter(bloom_might_contain(packed, "k")).count()
        assert survivors == 199  # zero false negatives, by construction

    def test_result_equals_plain_semi_join(self, spark):
        got = {
            r["o_orderpriority"]: (r["n_orders"], r["revenue_cents"])
            for r in join_bloom_prefilter(spark, SF).collect()
        }
        cust = load_table(spark, SF, "customer")
        keys = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
            "c_custkey"
        )
        orders = load_table(spark, SF, "orders")
        want = {
            r["o_orderpriority"]: (r["n_orders"], r["revenue_cents"])
            for r in orders.join(
                F.broadcast(keys),
                orders["o_custkey"] == keys["c_custkey"],
                "left_semi",
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100).cast("long")
                ).alias("revenue_cents"),
            )
            .collect()
        }
        assert got == want

"""Round 13: value-gates for the last rows-only queries (VERDICT r12
#4/#5). Each audit is a one-row companion that performs the
engine-internal comparison no SQL oracle can run (Arrow twin
equality, sketch error bounds) and emits the verdict bit alongside
SQL-exact aggregates the DuckDB oracle recomputes — flipping the bit
fails the driver's value hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table


class TestSimilarityTopkAudit:
    def test_pandas_twin_matches_jvm_exactly(self, spark, sf_dir):
        from dbt_eamples_spark.operators.similarity import (
            similarity_topk,
            similarity_topk_pandas,
        )

        jvm = similarity_topk(spark, sf_dir)
        pnd = similarity_topk_pandas(spark, sf_dir)
        diff = jvm.exceptAll(pnd).count() + pnd.exceptAll(jvm).count()
        # both paths round cosine to 6 dp before the shared
        # (cosine DESC, neighbor_id ASC) total order => identical
        assert diff == 0
        assert jvm.count() > 0

    def test_audit_row_reports_match(self, spark, sf_dir):
        from dbt_eamples_spark.operators.similarity import (
            similarity_topk,
            similarity_topk_audit,
        )

        rows = similarity_topk_audit(spark, sf_dir).collect()
        assert len(rows) == 1
        row = rows[0]
        assert row.pandas_matches_jvm is True
        jvm = similarity_topk(spark, sf_dir).collect()
        assert row.n_queries == len({r.query_id for r in jvm})
        assert row.n_pairs == len(jvm)
        assert row.neighbor_checksum == sum(r.neighbor_id for r in jvm)
        assert row.cosine_checksum_fp == sum(
            round(r.cosine * 1e6) for r in jvm
        )


class TestSketchAudits:
    def test_hll_within_documented_bound(self, spark, sf_dir):
        from dbt_eamples_spark.operators.relational import (
            agg_approx_distinct_audit,
        )

        rows = agg_approx_distinct_audit(spark, sf_dir).collect()
        assert len(rows) == 1
        row = rows[0]
        assert row.hll_within_bounds is True
        o = load_table(spark, sf_dir, "orders")
        exact = o.agg(
            F.countDistinct("o_custkey", "o_orderstatus").alias("d"),
            F.count("*").alias("n"),
        ).collect()[0]
        # exact_distinct_total sums per-status distincts = distinct
        # (custkey, status) pairs
        assert row.exact_distinct_total == exact.d
        assert row.n_orders_total == exact.n
        assert row.n_groups == o.select("o_orderstatus").distinct().count()

    def test_kll_within_documented_bound(self, spark, sf_dir):
        from dbt_eamples_spark.operators.relational import (
            agg_approx_percentiles_audit,
            agg_percentiles,
        )

        rows = agg_approx_percentiles_audit(spark, sf_dir).collect()
        assert len(rows) == 1
        row = rows[0]
        assert row.kll_within_bounds is True
        exact = agg_percentiles(spark, sf_dir).collect()
        assert row.n_groups == len(exact)
        assert row.pct_checksum_fp == sum(
            round((r.p50 + r.p90 + r.p99) * 1e4) for r in exact
        )

    def test_hll_bit_flips_on_out_of_bound_sketch(self, spark, sf_dir):
        """The gate actually gates: a sketch drifted past the bound
        must flip the bit (simulated by checking the comparison
        logic against a poisoned approx frame)."""
        from dbt_eamples_spark.operators.relational import (
            HLL_AUDIT_REL_ERR,
        )

        o = load_table(spark, sf_dir, "orders")
        exact = o.groupBy("o_orderstatus").agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
        )
        poisoned = exact.select(
            "o_orderstatus",
            (F.col("exact_customers") * 2).alias("approx_customers"),
        )
        bit = (
            exact.join(poisoned, "o_orderstatus")
            .agg(
                F.min(
                    (
                        F.abs(
                            F.col("approx_customers")
                            - F.col("exact_customers")
                        )
                        / F.col("exact_customers")
                    )
                    <= F.lit(HLL_AUDIT_REL_ERR)
                ).alias("ok")
            )
            .collect()[0]
        )
        assert bit.ok is False

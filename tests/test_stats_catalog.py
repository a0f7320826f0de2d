"""ANALYZE / catalog-statistics surface (VERDICT r3 #7): external
tables + COMPUTE STATISTICS give the planner rowCount/sizeInBytes, so
broadcast decisions derive from optimizer statistics instead of raw
file-size heuristics — the property that keeps star joins broadcast
when a dimension's compressed file outgrows the default threshold."""

from __future__ import annotations

import pytest

from dbt_eamples_spark.catalog import (
    STATS_DB,
    register_stats_tables,
    table_stats,
)


@pytest.fixture(scope="module")
def stats_tables(spark, sf_dir):
    return register_stats_tables(spark, sf_dir)


class TestAnalyzeSurface:
    def test_analyze_records_row_counts(self, spark, stats_tables):
        assert f"{STATS_DB}.nation" in stats_tables
        st = table_stats(spark, f"{STATS_DB}.nation")
        assert st["row_count"] == 25
        assert st["size_bytes"] > 0
        li = table_stats(spark, f"{STATS_DB}.lineitem")
        assert li["row_count"] == 6000  # sf0.001

    def test_external_tables_do_not_copy_data(self, spark, stats_tables):
        # external: location is the fixture parquet itself
        rows = spark.sql(f"DESCRIBE EXTENDED {STATS_DB}.nation").collect()
        info = {r["col_name"]: r["data_type"] for r in rows}
        assert "nation.parquet" in info.get("Location", "")
        assert info.get("Type") == "EXTERNAL"

    def test_reregistration_is_idempotent(self, spark, sf_dir):
        names = register_stats_tables(spark, sf_dir)
        assert len(names) == 10
        assert table_stats(spark, f"{STATS_DB}.region")["row_count"] == 5

    def test_planner_consumes_stats_under_cbo(self, spark, stats_tables):
        """EXPLAIN COST must show rowCount statistics flowing from
        the catalog into plan costing, and the star join must choose
        broadcast-hash for every dimension side."""
        star = f"""
            SELECT n_name, sum(l_extendedprice) AS revenue
            FROM {STATS_DB}.lineitem
            JOIN {STATS_DB}.orders   ON l_orderkey = o_orderkey
            JOIN {STATS_DB}.customer ON o_custkey  = c_custkey
            JOIN {STATS_DB}.nation   ON c_nationkey = n_nationkey
            GROUP BY n_name
        """
        prev = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            cost = spark.sql(f"EXPLAIN COST {star}").collect()[0][0]
            physical = spark.sql(f"EXPLAIN FORMATTED {star}").collect()[0][0]
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
        assert "rowCount=" in cost, "ANALYZE stats not visible to costing"
        # FORMATTED prints each operator in tree + details sections
        assert physical.count("BroadcastHashJoin") >= 3
        assert "SortMergeJoin" not in physical

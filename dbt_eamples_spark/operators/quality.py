"""Warehouse data-quality checks — the ``dbt test`` surface.

The reference delegates testing entirely to dbt-core's generic
tests (none are defined in its project files; the capability is
dbt-the-tool's, not the repo's — see SURVEY.md §5). A user switching
from the reference still expects the four generic tests to exist, so
they are implemented here as engine-side aggregates: one result row
per test, ``n_violations`` + pass flag — the report ``dbt test``
prints.

Scale posture: each test is a single aggregate or anti-join over the
tested table — unique is one groupBy on the key (map-side combined),
relationships is a broadcast anti-join when the parent is a dim.
The four tests scan independently; at 100 TB you'd fuse the three
orders-side tests into one pass (observable via a shared scan —
Spark's exchange/scan reuse already dedups identical subplans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table

ACCEPTED_STATUSES = ("F", "O", "P")


def dq_schema_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-core's four generic tests over the orders table:

    - ``unique``: #distinct o_orderkey values appearing >1× (dbt's
      unique test counts duplicated values, not duplicated rows)
    - ``not_null``: #rows with null o_custkey
    - ``accepted_values``: #rows with o_orderstatus outside F/O/P
    - ``relationships``: #orders whose o_custkey has no matching
      customer (anti-join; customer side broadcast)
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    uniq = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.count("*").alias("n_violations"))
        .select(F.lit("unique_o_orderkey").alias("test_name"), "n_violations")
    )
    notnull = o.agg(
        F.count_if(F.col("o_custkey").isNull()).alias("n_violations")
    ).select(F.lit("not_null_o_custkey").alias("test_name"), "n_violations")
    accepted = o.agg(
        F.count_if(
            ~F.col("o_orderstatus").isin(*ACCEPTED_STATUSES)
        ).alias("n_violations")
    ).select(
        F.lit("accepted_values_o_orderstatus").alias("test_name"),
        "n_violations",
    )
    rel = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o.o_custkey == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("relationships_o_custkey").alias("test_name"),
            "n_violations",
        )
    )
    report = uniq.unionByName(notnull).unionByName(accepted).unionByName(rel)
    return report.select(
        "test_name", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )

"""JDBC source/sink (SURVEY.md §2.1 S1/S5 — the external-warehouse
path).

The reference's entire execution substrate is a live warehouse
connection (`/root/reference/connections.py:199-281` open/retry;
`helix-flow/utils/postgres_client.py:24-52` append + ``insert_dt``
audit column via ``to_sql``). Spark-first re-expression:
``spark.read/write.format("jdbc")`` — the read is *partitioned* so N
executors each pull a key-range slice in parallel (one connection per
partition), and the write appends with the same audit column the
parquet sink uses.

Scale notes:
 - A JDBC read WITHOUT ``partition_column`` is one connection on one
   executor — at warehouse scale always pass the partition bounds
   (or ``predicates``) so the scan fans out.
 - Catalyst pushes filters and column pruning into the generated SQL
   (``PushedFilters`` in the plan ⇒ ``WHERE`` in the remote query),
   so declarative filters run warehouse-side, not post-transfer.
 - ``fetchsize`` controls rows-per-roundtrip; the 1k JDBC default
   throttles bulk reads, so we default it higher.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from dbt_eamples_spark.sources.sinks import with_audit_col

DEFAULT_FETCHSIZE = 10_000


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    driver: str | None = None,
    fetchsize: int = DEFAULT_FETCHSIZE,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a warehouse table (or ``(subquery) alias``) over JDBC.

    Two fan-out modes, mutually exclusive:
     - ``partition_column`` + bounds + ``num_partitions``: Spark
       generates stride predicates over a numeric/temporal key, one
       remote query per partition (the standard bulk-extract shape);
     - ``predicates``: caller-supplied WHERE clauses, one partition
       each (for non-uniform keys where strides would skew).
    """
    if predicates is not None and partition_column is not None:
        raise ValueError("pass either partition_column bounds or predicates")
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    reader = reader.option("fetchsize", str(fetchsize))
    if driver:
        reader = reader.option("driver", driver)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column needs lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    if predicates is not None:
        # DataFrameReader.jdbc is the only surface for predicate lists
        props = {"fetchsize": str(fetchsize), **(options or {})}
        if driver:
            props["driver"] = driver
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    return reader.load()


def append_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    ts: dt.datetime | None = None,
    driver: str | None = None,
    batchsize: int = DEFAULT_FETCHSIZE,
    options: dict[str, str] | None = None,
) -> None:
    """Append rows + ``insert_dt`` audit column to a warehouse table
    (`postgres_client.py:34-48` semantics: UTC second-granularity
    stamp added before the append). Each task holds one connection
    and batches ``batchsize`` rows per executeBatch."""
    writer = (
        with_audit_col(df, ts)
        .write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    writer.save()

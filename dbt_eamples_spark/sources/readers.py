"""External-record sources (SURVEY.md §2.1 S3/S4).

The reference ingests semi-structured JSON-RPC records
(`omni_rpc_client.py:36-51`: ``perform_request`` → list of dicts
with optional keys) and fans out per-transaction detail fetches over
a bounded thread pool with per-call retry (`omni_rpc_client.py:71-98`,
max_workers=2).

Spark-first re-expression:
 - **json_records_source**: record batches land as JSON strings and
   are parsed with an explicit permissive schema via ``from_json`` —
   schema-on-read with nullable fields, exactly the ``tx.get(...)``
   semantics. At scale this is ``spark.readStream`` from Kafka/files;
   here the JSON column already sits in the events fixture.
 - **fanout_fetch**: the request-parameter table is partitioned and
   each partition drains its requests through an Arrow-batched
   ``mapInPandas`` stage with per-row retry — executor-side
   parallelism replaces the thread pool (parallelism = partition
   count, not max_workers), and Spark task retries replace the
   manual future-retry loop. The endpoint is injected; the default
   is a deterministic local simulator so the operator is testable
   hermetically.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dbt_eamples_spark.catalog import load_table

# permissive record schema: every field nullable (optional keys)
RPC_RECORD_SCHEMA = StructType(
    [
        StructField("k", LongType(), True),
    ]
)


def json_records_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON payload column with a declared permissive
    schema — missing/extra keys → NULL, never an error
    (the ``tx.get("type_int")`` semantics of omni_rpc_client.py:123)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), RPC_RECORD_SCHEMA).alias("rec"),
    ).select(
        "event_id",
        F.col("rec.k").alias("k"),
    )


# ---------------------------------------------------------------------------
# fan-out fetch
# ---------------------------------------------------------------------------

_FETCH_SCHEMA = StructType(
    [
        StructField("req_id", LongType()),
        StructField("txid", StringType()),
        StructField("fee", DoubleType()),
        StructField("attempts", LongType()),
    ]
)


def simulated_endpoint(req_id: int) -> dict:
    """Deterministic local stand-in for ``omni_gettransaction``:
    a pure function of the request id (SQL-expressible, so the
    DuckDB oracle can reproduce it)."""
    return {
        "txid": hashlib.md5(str(req_id).encode()).hexdigest(),
        "fee": (req_id % 997) / 100.0,
    }


def fanout_fetch(
    spark: SparkSession,
    requests: DataFrame,
    fetch: Callable[[int], dict] | None = None,
    max_retries: int = 3,
    parallelism: int | None = None,
) -> DataFrame:
    """Bounded fan-out with per-request retry as a mapInPandas stage.

    ``requests`` must have a ``req_id`` long column. Concurrency is
    the partition count (the reference capped at 2 worker threads;
    on a cluster this is ``parallelism`` × executors, throttled by
    repartition, not by a local pool).
    """
    fetch = fetch or simulated_endpoint
    if parallelism:
        requests = requests.repartition(parallelism, "req_id")

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for req_id in batch["req_id"]:
                last_err: Exception | None = None
                for attempt in range(1, max_retries + 1):
                    try:
                        rec = fetch(int(req_id))
                        rows.append(
                            {
                                "req_id": int(req_id),
                                "txid": rec["txid"],
                                "fee": rec["fee"],
                                "attempts": attempt,
                            }
                        )
                        last_err = None
                        break
                    except Exception as exc:  # retry, reference-style
                        last_err = exc
                if last_err is not None:
                    # failed rows surface as NULL payload, not a drop
                    # (the reference keeps failed decodes as None,
                    # omni_rpc_client.py:111-113)
                    rows.append(
                        {
                            "req_id": int(req_id),
                            "txid": None,
                            "fee": None,
                            "attempts": max_retries,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows, columns=_FETCH_SCHEMA.fieldNames())

    return requests.mapInPandas(fetch_partition, schema=_FETCH_SCHEMA)


def fanout_fetch_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: fan-out fetch over the block range the
    orders table spans (first 200 order keys as request ids)."""
    o = load_table(spark, sf_dir, "orders")
    reqs = (
        o.select(F.col("o_orderkey").alias("req_id"))
        .filter(F.col("req_id") <= 200)
        .distinct()
    )
    return fanout_fetch(spark, reqs, parallelism=8)

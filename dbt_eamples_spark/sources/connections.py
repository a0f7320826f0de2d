"""Connection lifecycle: bounded-backoff open retry and engine-level
query cancel.

Mirrors the reference's connection manager semantics
(connections.py:199-296): ``open`` retries the connect callable with
an attempt² backoff against a caller-scoped set of retryable
exception classes, and ``cancel`` kills every query belonging to a
session — re-expressed for Spark, where the "session" analogue is a
job group: every action launched under ``cancellable(...)`` tags its
jobs with a group id, and ``cancel_group`` aborts all of them
mid-flight (Spark kills the running tasks; the driver call raising
is the contract, matching system$cancel_all_queries).

Spark task retries already cover executor-side transience; this
wrapper exists for DRIVER-side connect failures (JDBC warehouse
still booting, DNS blip at session start), which Spark does not
retry on its own.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Callable, Iterator, Sequence, TypeVar

from pyspark.sql import DataFrame, SparkSession

T = TypeVar("T")

DEFAULT_RETRIES = 3


def exponential_backoff(attempt: int) -> float:
    """attempt² seconds — the reference's curve (connections.py:255)."""
    return float(attempt * attempt)


def retry_connection(
    connect: Callable[[], T],
    *,
    retries: int = DEFAULT_RETRIES,
    retry_timeout: float | Callable[[int], float] = exponential_backoff,
    retryable_exceptions: Sequence[type[BaseException]] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Call ``connect`` up to ``retries + 1`` times, sleeping
    ``retry_timeout`` (a constant or an attempt→seconds callable)
    between attempts. Non-retryable exceptions and the final attempt
    propagate unchanged — the caller sees the real error, not a
    retry wrapper."""
    attempt = 0
    while True:
        try:
            return connect()
        except tuple(retryable_exceptions):
            attempt += 1
            if attempt > retries:
                raise
            wait = (
                retry_timeout(attempt)
                if callable(retry_timeout)
                else retry_timeout
            )
            sleep(wait)


def read_jdbc_with_retry(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    retries: int = DEFAULT_RETRIES,
    retry_timeout: float | Callable[[int], float] = exponential_backoff,
    sleep: Callable[[float], None] = time.sleep,
    **kwargs,
) -> DataFrame:
    """``read_jdbc`` with driver-side connect retry: plan the read
    AND touch the remote schema (``df.schema`` forces the JDBC
    metadata round-trip) under the retry loop, so a warehouse that
    is still booting gets the backoff instead of failing the job.
    The data-pull itself then runs under Spark's own task retries."""
    from dbt_eamples_spark.sources.jdbc import read_jdbc

    def connect() -> DataFrame:
        df = read_jdbc(spark, url, table, **kwargs)
        df.schema  # noqa: B018 — forces the connect; schema is cached
        return df

    return retry_connection(
        connect,
        retries=retries,
        retry_timeout=retry_timeout,
        sleep=sleep,
    )


@contextmanager
def cancellable(
    spark: SparkSession, group_id: str, description: str = ""
) -> Iterator[str]:
    """Tag every action started inside the block with ``group_id``
    so ``cancel_group`` can abort them from another thread — the
    Spark analogue of cancelling all queries on a warehouse session
    id (connections.py:284-296). Clears the tag on exit so later
    actions are not accidentally cancellable under a stale id."""
    sc = spark.sparkContext
    sc.setJobGroup(group_id, description or group_id, interruptOnCancel=True)
    try:
        yield group_id
    finally:
        sc.setJobGroup("", "")


def cancel_group(spark: SparkSession, group_id: str) -> None:
    """Abort every in-flight job tagged with ``group_id``. The
    cancelled action raises in its caller thread; idempotent when
    nothing is running."""
    spark.sparkContext.cancelJobGroup(group_id)

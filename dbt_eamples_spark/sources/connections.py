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

# Transient-by-construction driver-side failures. Deliberately
# NARROW — the reference enumerates an explicit retryable list
# (connections.py:255-281) rather than retrying everything; a bad
# credential or a missing table must fail on attempt 1, not after
# ~14 s of backoff. ConnectionError covers its refused/reset/aborted
# subclasses; TimeoutError covers socket timeouts (PEP 3151).
TRANSIENT_EXCEPTIONS: tuple[type[BaseException], ...] = (
    ConnectionError,
    TimeoutError,
)

# Root-cause markers of transient JDBC/Py4J failures. The Python side
# of a JVM error is one opaque Py4JJavaError, so transience is
# classified from the java class names / messages in its stringified
# cause chain — the JDBC analogues of the reference's retryable list.
_JDBC_TRANSIENT_MARKERS = (
    "SQLTransientException",
    "SQLTransientConnectionException",
    "SQLRecoverableException",
    "SQLNonTransientConnectionException",  # Derby cold-start surfaces this
    "java.net.ConnectException",
    "java.net.SocketTimeoutException",
    "java.net.SocketException",
    "java.net.UnknownHostException",
    "connection refused",
    "connection reset",
    "connection timed out",
)


def is_transient_connect_error(exc: BaseException) -> bool:
    """True when ``exc`` looks like a transient connect failure:
    either a Python-native transient class, or a Py4J-wrapped JDBC
    error whose cause chain names a transient java exception."""
    if isinstance(exc, TRANSIENT_EXCEPTIONS):
        return True
    text = str(exc).lower()
    return exc.__class__.__name__ == "Py4JJavaError" and any(
        m.lower() in text for m in _JDBC_TRANSIENT_MARKERS
    )


def exponential_backoff(attempt: int) -> float:
    """attempt² seconds — the reference's curve (connections.py:255)."""
    return float(attempt * attempt)


def retry_connection(
    connect: Callable[[], T],
    *,
    retries: int = DEFAULT_RETRIES,
    retry_timeout: float | Callable[[int], float] = exponential_backoff,
    retryable_exceptions: Sequence[type[BaseException]] = TRANSIENT_EXCEPTIONS,
    retryable_predicate: Callable[[BaseException], bool] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Call ``connect`` up to ``retries + 1`` times, sleeping
    ``retry_timeout`` (a constant or an attempt→seconds callable)
    between attempts. Only exceptions matching ``retryable_exceptions``
    (or, when given, ``retryable_predicate``) are retried — permanent
    failures (bad credentials, missing table, SQL errors) propagate
    on the first attempt, as in the reference's explicit retryable
    list. The final attempt propagates unchanged either way."""
    attempt = 0
    while True:
        try:
            return connect()
        except BaseException as exc:  # noqa: BLE001 — re-raised unless retryable
            retryable = (
                retryable_predicate(exc)
                if retryable_predicate is not None
                else isinstance(exc, tuple(retryable_exceptions))
            )
            if not retryable:
                raise
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
    The data-pull itself then runs under Spark's own task retries.
    Retries are scoped to transient connect failures only
    (``is_transient_connect_error``): an auth failure or a missing
    table surfaces immediately."""
    from dbt_eamples_spark.sources.jdbc import read_jdbc

    def connect() -> DataFrame:
        df = read_jdbc(spark, url, table, **kwargs)
        df.schema  # noqa: B018 — forces the connect; schema is cached
        return df

    return retry_connection(
        connect,
        retries=retries,
        retry_timeout=retry_timeout,
        retryable_predicate=is_transient_connect_error,
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

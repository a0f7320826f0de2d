"""As-of (time-travel) join — a custom operator Spark lacks natively
(BASELINE.json north-star; generalizes the reference's time-bounded
query shape, `dbt_query.py:82-83`, and the watermark "latest state
before T" pattern, `transactions_dag.py:22-30`).

Implementation is the scalable union-and-scan formulation, NOT a
range join: tag right rows 0 and left rows 1, union, and take a
running ``last(ignorenulls)`` of the right payload over a single
(key, time, tag) sort. One shuffle keyed by the join key, O(n log n)
local sort, zero pair explosion — a per-key range join materializes
|left_i|·|right_i| candidate pairs per key before filtering, which
at 100 TB with hot keys is the difference between a sort and an
outage. Hot-key skew here is bounded by the sort (mitigation if a
single key outgrows an executor: pre-bucket time into coarse ranges
and two-pass merge — not needed at fixture scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (prior-or-equal semantics; ties on ``right_ts`` broken by the
    greatest ``tiebreak``). Left rows without a match keep NULLs.

    ``payload`` maps right-column → output-column names.
    """
    lcols = [c for c in left.columns]
    carried = [f"_asof_{o}" for o in payload.values()]
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_src"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).alias(c) for c in carried],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_src"),
        *[F.lit(None).alias(c) for c in lcols],
        *[
            F.col(src).alias(f"_asof_{dst}")
            for src, dst in payload.items()
        ],
    )
    order = [F.col("_t"), F.col("_src")]
    if tiebreak is not None:
        # ascending: among equal (_t), the LAST right row in frame
        # order carries the greatest tiebreak value
        order.append(F.col(f"_asof_{payload[tiebreak]}"))
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"{c}_f")
            for c in carried
        ],
    )
    return filled.filter(F.col("_src") == 1).select(
        *lcols,
        *[
            F.col(f"_asof_{dst}_f").alias(dst)
            for dst in payload.values()
        ],
    )


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract query: last-touch purchase attribution — for
    every event, the same user's most recent prior-or-equal
    'purchase' event (the classic as-of self-join; an event that IS
    a purchase attributes to itself)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    return as_of_join(
        ev,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"event_id": "last_purchase_id", "ts": "last_purchase_ts"},
        tiebreak="event_id",
    )


ASOF_TOLERANCE_DAYS = 7


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND — the production variant of
    :func:`join_asof` (pandas `merge_asof(tolerance=...)`, kdb `wj`
    within a window): a match older than ``ASOF_TOLERANCE_DAYS``
    is no match at all (attributing today's click to a purchase
    from months ago is worse than attributing nothing). NULLs out
    the carried payload when the matched purchase is stale, and
    reports the staleness flag so the attrition is visible.

    Scale shape: EXACTLY the union-and-scan as-of plan (one key
    exchange, running last-non-null, zero pair explosion) — the
    tolerance is a post-fill per-row comparison, free at any
    scale."""
    base = join_asof(spark, sf_dir)
    fresh = F.col("last_purchase_ts") >= F.col("ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE_DAYS} DAYS"
    )
    return base.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(fresh, F.col("last_purchase_id")).alias("last_purchase_id"),
        F.when(fresh, F.col("last_purchase_ts")).alias("last_purchase_ts"),
        (F.col("last_purchase_ts").isNotNull() & ~F.coalesce(fresh, F.lit(False)))
        .alias("stale_dropped"),
    )

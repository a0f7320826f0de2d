"""Structured Streaming operators (SURVEY.md §2.9).

The reference's "streaming" is micro-batch-by-cron (15-min DAG,
`transactions_dag.py:66`); its idiomatic Spark form is Structured
Streaming with ``Trigger.AvailableNow`` (drain-what's-there, stop)
plus event-time watermarks + tumbling windows for late data — absent
from the reference but the natural expression of the events fixture.

``stream_tumbling_count`` / ``stream_session_agg`` are the
batch-equivalent queries (tumbling and session windows are
deterministic functions of event time, so batch and streaming give
identical results — asserted in tests/test_pipeline.py by running
the same aggregation through an actual ``readStream`` →
``writeStream`` pipeline with AvailableNow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table, table_path

TUMBLE = "1 hour"
WATERMARK = "2 hours"
SESSION_GAP = "30 minutes"


def _windowed_counts(df: DataFrame) -> DataFrame:
    """Tumbling 1-hour window counts per event_type; flattened to
    (window_start, event_type, n_events, total_value)."""
    return (
        df.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the tumbling-window count (oracle-checkable;
    the streaming form below computes the identical frame)."""
    return _windowed_counts(load_table(spark, sf_dir, "events"))


def _session_aggs(df: DataFrame) -> DataFrame:
    """Gap-based sessionization: per user, events within
    ``SESSION_GAP`` of the session's rolling end merge into one
    session (``session_window`` — Spark's native stateful session
    operator; in streaming mode state is per (user, open session)
    and evicted by the watermark, so memory is bounded by ACTIVE
    sessions, not history). session_end = last event + gap,
    exclusive, matching the oracle's gaps-and-islands SQL."""
    return (
        df.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def stream_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the session-window aggregate over events
    (oracle: classic gaps-and-islands lag/cumsum SQL)."""
    return _session_aggs(load_table(spark, sf_dir, "events"))


def stream_tumbling_count_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """True Structured Streaming run: file source → watermark →
    tumbling window → complete-mode memory sink, drained with
    ``Trigger.AvailableNow`` (the cron-drain semantics of the
    reference's 15-min DAG)."""
    windowed = _windowed_counts(_events_stream(spark, sf_dir))
    _drain(windowed, "complete", checkpoint, out_table)


def stream_session_agg_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Structured Streaming sessionization: watermark-evicted
    ``session_window`` state, drained with AvailableNow."""
    sessions = _session_aggs(_events_stream(spark, sf_dir))
    _drain(sessions, "complete", checkpoint, out_table)


def _events_stream(
    spark: SparkSession, sf_dir: str, watermark: bool = True
) -> DataFrame:
    """events fixture as a watermarked file-stream source.

    ``watermark=False`` returns the bare stream for callers that set
    their own watermark on a renamed event-time column (the
    stream-stream join) — Spark disallows redefining one."""
    # schema from the RAW file (ts arrives as long under
    # nanosAsLong; load_table's converted schema would mismatch).
    # Set the conf here too so this works under ANY session, not
    # only our own factory (driver sessions don't pre-set it).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NTZ→TIMESTAMP below reads naive values in the session tz —
    # pin UTC so any session (driver's vanilla one included) agrees
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # file-stream source requires a directory: stream the sf dir,
    # glob-filtered to the events file
    stream = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # nanos column arrives as long under nanosAsLong — same convert
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # un-flagged parquet timestamps arrive as NTZ — normalize to
    # TIMESTAMP (session tz UTC, value-preserving) so watermarks and
    # stream-stream joins see the one engine-wide event-time type
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream.withWatermark("ts", WATERMARK) if watermark else stream


def stateful_user_totals_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-user running (event count, value total) with first/last seen
    timestamps, emitted once per micro-batch per active user.

    This is the escape hatch for state machines built-in windows
    can't express (running totals across a user's whole lifetime,
    conditional state transitions). State is one tiny tuple per
    user, partitioned by the groupBy key across executors and
    checkpointed — memory scales with |users|, not |events|. The
    handler receives Arrow batches (pandas), so per-batch work is
    vectorized; nothing touches the driver.

    Batch equivalence (asserted in tests): after an AvailableNow
    drain, each user's LAST emitted row equals the batch groupBy
    aggregate over the same fixture.
    """
    import pandas as pd  # local import: only this op needs it
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, batches, state: GroupState):
        n, total, first_ts, last_ts = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
            lo = pdf["ts"].min()
            hi = pdf["ts"].max()
            first_ts = lo if first_ts is None else min(first_ts, lo)
            last_ts = hi if last_ts is None else max(last_ts, hi)
        state.update((n, total, first_ts, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "first_ts": [first_ts],
                "last_ts": [last_ts],
            }
        )

    out_schema = (
        "user_id long, n_events long, total_value double, "
        "first_ts timestamp, last_ts timestamp"
    )
    state_schema = "n long, total double, first_ts timestamp, last_ts timestamp"
    updated = (
        _events_stream(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    _drain(updated, "update", checkpoint, out_table)


def user_totals_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch aggregate the stateful stream must converge to."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def _drain(df: DataFrame, mode: str, checkpoint: str, out_table: str) -> None:
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of streaming idempotency-key dedup: one row per
    (user_id, event_type, value) key with its first-seen timestamp
    and duplicate count. The streaming twin
    (:func:`stream_dedup_streaming`) is Spark's
    ``dropDuplicatesWithinWatermark`` — state holds one entry per
    key seen inside the watermark horizon, so memory is bounded by
    the key arrival rate, not history. One shuffle (the keyed
    aggregate), map-side combined."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type", "value").agg(
        F.min("ts").alias("first_ts"),
        F.count("*").alias("n_dups"),
    )


def stream_dedup_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Structured Streaming dedup: watermark + state-store key
    tracking via ``dropDuplicatesWithinWatermark``. Keeps the FIRST
    arriving row per key (arrival order, not event time) — the
    batch-equivalence test therefore compares key SETS, which are
    deterministic, rather than kept-row identity, which is not."""
    deduped = (
        # _events_stream already carries the module watermark
        _events_stream(spark, sf_dir)
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "value"])
        .select("user_id", "event_type", "value", "ts")
    )
    _drain(deduped, "append", checkpoint, out_table)


def stream_incremental_append(
    spark: SparkSession,
    sf_dir: str,
    checkpoint: str,
    sink_path: str,
    report_sink=None,
) -> None:
    """The reference's cron pipeline (`transactions_dag.py:14-46`:
    read watermark → fetch delta → append with audit column) as a
    true Structured Streaming job: file source → ``foreachBatch``
    that anti-joins each micro-batch against the sink's existing
    keys BEFORE appending (row-granular idempotence the reference
    lacks) and stamps the audit column, drained with AvailableNow.

    foreachBatch is the right sink shape here because the
    idempotence check needs a batch-side read of the sink — a plain
    ``writeStream.format("parquet")`` cannot express it. Re-running
    the whole job against the same sink appends zero rows (asserted
    in tests), which is the property that makes cron retries safe.

    ``report_sink`` (a ``reports.LocalReportSink``) opts into the
    per-batch run report the reference posts after each cron pull
    (slack_utils.py:66-113): appended-row count + a bounded sample
    table, skipped when the batch appends nothing. Reporting caches
    the batch delta for its count+sample pass, so leave it off for
    count-only monitoring — RunReportListener gives that for free
    from the progress bus.
    """
    from dbt_eamples_spark.sources.sinks import with_audit_col

    src = _events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "ts"
    )

    def upsert(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        out = batch
        # ONLY the missing-sink (first batch) case may skip the
        # anti-join; any other read failure (corrupt file,
        # permissions, transient FS error) must fail the micro-batch
        # — silently appending without the guard is exactly the
        # duplication this operator exists to prevent.
        try:
            existing = batch.sparkSession.read.parquet(sink_path).select(
                "event_id"
            )
            out = batch.join(existing, "event_id", "left_anti")
        except AnalysisException:
            pass  # first batch: sink doesn't exist yet
        if report_sink is None:
            with_audit_col(out).write.mode("append").parquet(sink_path)
            return
        from dbt_eamples_spark.streaming.reports import (
            REPORT_MAX_ROWS,
            build_run_report,
        )

        out = out.persist()
        try:
            n = out.count()
            with_audit_col(out).write.mode("append").parquet(sink_path)
            report = build_run_report(
                [tuple(r) for r in out.limit(REPORT_MAX_ROWS).collect()],
                out.columns,
                source=sink_path,
                run_id=f"batch-{batch_id}",
                total=n,
            )
            if report is not None:
                report_sink.emit(report)
        finally:
            out.unpersist()

    q = (
        src.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)


PAIR_WINDOW = "1 hour"


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the watermarked stream-stream join: each click
    paired with every purchase by the same user within the next
    hour (attribution-window joins — the canonical stream-stream
    shape). Equi key (user_id) carries the shuffle; the time bound
    evaluates as a residual, so there is no cross product. lag_s is
    an integer epoch difference — engine-exact, no float."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    j = clicks.join(
        purchases,
        (F.col("cu") == F.col("pu"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {PAIR_WINDOW}")),
    )
    return j.select(
        F.col("cu").alias("user_id"),
        "click_id",
        "purchase_id",
        F.expr(
            "(unix_micros(cast(purchase_ts as timestamp))"
            " - unix_micros(cast(click_ts as timestamp))) div 1000000"
        ).alias("lag_s"),
    )


def stream_interval_join_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """True stream-stream inner join: two watermarked event streams,
    equi key + event-time range condition. Spark buffers each side's
    rows in the state store only as long as the time bound plus the
    watermark allows — state is bounded by rows-per-horizon, not
    history, which is what makes this viable on an unbounded stream.
    Drained with AvailableNow; append mode (inner joins emit exactly
    the batch-equivalent pairs — asserted in tests)."""
    clicks = (
        _events_stream(spark, sf_dir, watermark=False)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("cu"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        _events_stream(spark, sf_dir, watermark=False)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("pu"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    j = clicks.join(
        purchases,
        (F.col("cu") == F.col("pu"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {PAIR_WINDOW}")),
    ).select(
        F.col("cu").alias("user_id"),
        "click_id",
        "purchase_id",
        F.expr(
            "(unix_micros(cast(purchase_ts as timestamp))"
            " - unix_micros(cast(click_ts as timestamp))) div 1000000"
        ).alias("lag_s"),
    )
    _drain(j, "append", checkpoint, out_table)


SLIDE = "15 minutes"


def stream_sliding_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the sliding-window aggregate: 1-hour windows
    every 15 minutes per event_type (each event lands in 4
    overlapping windows — the smoothing dashboards want where a
    tumbling window jitters). ``F.window`` with a slide compiles to
    a 4-row explode + hash aggregate: the shuffle carries (window,
    type) partial aggregates, NOT 4× the events, because the partial
    agg folds map-side. Value totals in integer cents (engine-exact
    across the overlap replication)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", TUMBLE, SLIDE).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long"))
                / F.lit(100.0),
                2,
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_sliding_count_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Structured Streaming twin: watermarked sliding windows,
    complete-mode memory sink, AvailableNow drain. State is one
    aggregate row per open (window, type) — bounded by the horizon
    (4 overlapping windows per slide), evicted by the watermark."""
    ev = _events_stream(spark, sf_dir)
    windowed = (
        ev.groupBy(F.window("ts", TUMBLE, SLIDE).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long"))
                / F.lit(100.0),
                2,
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    _drain(windowed, "complete", checkpoint, out_table)


def ts_resample_ohlc_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Structured Streaming twin of `operators.behavior.
    ts_resample_ohlc`: hourly OHLC bars maintained incrementally.
    The batch form picks open/close by row_number over (ts,
    event_id) — a sort-window streaming can't run; the twin states
    the SAME picks as ``min_by``/``max_by`` over the (ts, event_id)
    struct, which are ordinary aggregates with O(1) state per open
    (window, type) and therefore stream (batch-identical: the pick
    under a total order is the argmin/argmax under that order —
    asserted in tests/test_pipeline.py). Watermark evicts closed
    bars; complete-mode memory sink for the drain assert."""
    ev = _events_stream(spark, sf_dir)
    key = F.struct(F.col("ts"), F.col("event_id"))
    bars = (
        ev.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )
    _drain(bars, "complete", checkpoint, out_table)


def events_anomaly_rolling_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Streaming twin of `operators.behavior.events_anomaly_rolling`:
    the stream maintains ONLY the hourly count rollup (ordinary
    windowed agg, O(1) state per open (window, type)); the trailing-
    24h z-score pass — a RANGE window no streaming agg expresses —
    runs over the drained AGGREGATE, which is O(hours × types) rows,
    via the exact batch flag pass (`anomaly_flags_over_hourly`).
    This is the production split: incremental rollup in the stream,
    anomaly evaluation on the bounded aggregate each drain — and it
    is batch-identical because the flag pass consumes an identical
    hourly frame."""
    from dbt_eamples_spark.operators.behavior import (
        anomaly_flags_over_hourly,
    )

    ev = _events_stream(spark, sf_dir)
    hourly = (
        ev.groupBy(F.window("ts", TUMBLE).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type", F.col("w.start").alias("hour"), "n_events"
        )
    )
    inner = f"{out_table}__hourly"
    _drain(hourly, "complete", checkpoint, inner)
    anomaly_flags_over_hourly(
        spark.table(inner)
    ).createOrReplaceTempView(out_table)


def ts_ewma_smooth_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Streaming twin of `operators.behavior.ts_ewma_smooth`: the
    stream maintains ONLY the daily count rollup (ordinary windowed
    agg, O(1) state per open (day, type)); the fixed-point EWMA
    recurrence — sequential by definition — runs over the drained
    AGGREGATE (O(days x types) rows) via the exact batch fold
    (`ewma_over_daily`). Batch-identical because the fold consumes
    an identical daily frame; the production cadence re-runs the
    bounded fold per drain, exactly like the anomaly twin."""
    from dbt_eamples_spark.operators.behavior import ewma_over_daily

    ev = _events_stream(spark, sf_dir)
    daily = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "event_type", F.to_date("w.start").alias("day"), "n_events"
        )
    )
    inner = f"{out_table}__daily"
    _drain(daily, "complete", checkpoint, inner)
    ewma_over_daily(spark.table(inner)).createOrReplaceTempView(out_table)


def events_changepoint_cusum_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Streaming twin of `operators.behavior.
    events_changepoint_cusum`: same split as the EWMA twin — the
    stream keeps the daily rollup, the integer CUSUM pass
    (`cusum_over_daily`) re-evaluates on the drained aggregate (the
    series mean that parameterizes k and h is a full-series
    statistic, so per-drain re-evaluation is the SEMANTICS, not an
    approximation)."""
    from dbt_eamples_spark.operators.behavior import cusum_over_daily

    ev = _events_stream(spark, sf_dir)
    daily = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "event_type", F.to_date("w.start").alias("day"), "n_events"
        )
    )
    inner = f"{out_table}__daily"
    _drain(daily, "complete", checkpoint, inner)
    cusum_over_daily(spark.table(inner)).createOrReplaceTempView(out_table)


def ts_seasonal_decompose_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Streaming twin of `operators.behavior.ts_seasonal_decompose`
    (VERDICT r5 #6): the stream maintains ONLY the daily count
    rollup; the centered-window trend + weekday seasonal-index
    passes — RANGE windows and a full-series per-weekday mean no
    streaming agg expresses — re-run over the drained O(days × types)
    aggregate per drain (`seasonal_decompose_over_daily`), the
    EWMA/CUSUM/Holt twin split. Per-drain re-evaluation is the
    SEMANTICS here: the seasonal index is a full-series statistic,
    so each drain re-states the decomposition of everything seen."""
    from dbt_eamples_spark.operators.behavior import (
        seasonal_decompose_over_daily,
    )

    ev = _events_stream(spark, sf_dir)
    daily = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "event_type", F.to_date("w.start").alias("day"), "n_events"
        )
    )
    inner = f"{out_table}__daily"
    _drain(daily, "complete", checkpoint, inner)
    seasonal_decompose_over_daily(
        spark.table(inner)
    ).createOrReplaceTempView(out_table)


def ts_autocorrelation_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Streaming twin of `operators.behavior.ts_autocorrelation`:
    daily rollup in the stream, correlogram over the drained
    aggregate (`autocorrelation_over_daily`) — the n-scaled
    centering cx = n·x − S depends on the full-series count and sum,
    so the exact fold re-runs on the bounded daily grid per drain."""
    from dbt_eamples_spark.operators.behavior import (
        autocorrelation_over_daily,
    )

    ev = _events_stream(spark, sf_dir)
    daily = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("x"))
        .select("event_type", F.to_date("w.start").alias("day"), "x")
    )
    inner = f"{out_table}__daily"
    _drain(daily, "complete", checkpoint, inner)
    autocorrelation_over_daily(
        spark.table(inner)
    ).createOrReplaceTempView(out_table)


def ts_holt_linear_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Streaming twin of `operators.behavior.ts_holt_linear`: the
    daily rollup is the streamed state (ordinary windowed agg); the
    two-state Holt fold — sequential by definition — re-runs over
    the drained O(days x types) aggregate per drain
    (`holt_over_daily`), the EWMA/CUSUM twin split."""
    from dbt_eamples_spark.operators.behavior import holt_over_daily

    ev = _events_stream(spark, sf_dir)
    daily = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "event_type", F.to_date("w.start").alias("day"), "n_events"
        )
    )
    inner = f"{out_table}__daily"
    _drain(daily, "complete", checkpoint, inner)
    holt_over_daily(spark.table(inner)).createOrReplaceTempView(out_table)


# late-data accounting: hourly arrival trigger batches, watermark
# delay 2 h (same policy as WATERMARK above), deterministic network
# jitter up to 4 h so the fixture actually EXERCISES the late path
# (its raw event_id order tracks event time — nothing would be late)
LATE_TRIGGER_US = 3600 * 1_000_000
LATE_DELAY_US = 2 * 3600 * 1_000_000
LATE_JITTER_US = 4 * 3600 * 1_000_000


def late_data_streaming_audit(
    spark: SparkSession,
    events,
    staging_dir: str,
    checkpoint: str,
    out_table: str,
    delay: str = WATERMARK,
) -> dict:
    """REAL Structured Streaming twin of the late-data accounting:
    replay ``events`` (ts, us, batch_id) in ARRIVAL order — one
    parquet file per arrival batch, ``maxFilesPerTrigger=1`` so each
    micro-batch is exactly one arrival window — through a
    watermarked hourly aggregate in append mode, and return the
    engine's OWN late-drop accounting (Σ numRowsDroppedByWatermark
    over the per-batch progress events).

    What this proves: the batch replay's watermark SCHEDULE (the
    max-event-time-per-prior-batch − delay rule, advancing at batch
    boundaries) matches the engine bit-for-bit — the test asserts
    the engine counter equals the replay's prediction. Predicate
    nuances pinned EMPIRICALLY against this Spark build: (a) the
    displayed per-batch watermark = ms-floored max event time over
    all PRIOR batches − delay, exactly the replay's rule; (b) a
    windowed AGGREGATE merges a late row into still-open state and
    only counts a drop when the row's window was EVICTED in an
    earlier batch — i.e. window_end ≤ the PREVIOUS batch's
    watermark (eviction runs at batch end with that batch's own
    watermark); (c) the counter tallies POST-partial-agg rows, so
    several same-window stragglers inside one micro-batch count as
    ONE drop. Stream-stream joins/dedup drop on the raw event time
    instead — `stream_late_data_metrics` reports that row-level
    rule; the tests compute the eviction-rule prediction with the
    same machinery and assert exact equality with the engine
    counter."""
    import glob
    import os
    import shutil

    os.makedirs(staging_dir, exist_ok=True)
    batch_ids = sorted(
        r["batch_id"]
        for r in events.select("batch_id").distinct().collect()
    )
    for i, b in enumerate(batch_ids):
        tmp = os.path.join(staging_dir, "_tmp")
        (
            events.filter(F.col("batch_id") == b)
            .select("ts")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(staging_dir, f"batch_{i:05d}.parquet"))
        shutil.rmtree(tmp)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    schema = spark.read.parquet(
        os.path.join(staging_dir, "batch_00000.parquet")
    ).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(staging_dir)
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", TUMBLE).alias("w"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(out_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = 0
    n_batches = 0
    for p in q.recentProgress:
        n_batches += 1
        for so in p["stateOperators"]:
            dropped += so.get("numRowsDroppedByWatermark", 0)
    return {"dropped": dropped, "n_batches": n_batches}


def stream_late_data_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark accounting — per event-time hour, how many rows a
    watermarked streaming aggregate ACCEPTS vs DROPS as too late.
    Structured Streaming drops late rows silently (observable only
    via StreamingQueryProgress counters); this is the auditable
    batch twin, replaying the fixture's ingest order with Spark's
    exact watermark rule: the watermark during micro-batch ``b`` is
    ``max(event time over all batches < b) − delay`` (the watermark
    advances at batch BOUNDARIES), and a row is dropped iff its
    event time is below that.

    Arrival model: each event arrives ``jitter`` after its event
    time — a deterministic 60-bit md5 hash of event_id folded into
    [0, 4 h) (the fixture's raw ingest order tracks event time, so
    without jitter nothing is ever late and the drop path is dead
    code). Micro-batches are 1-hour ARRIVAL-time windows — exactly
    a processing-time trigger. Scale posture: the corpus passes
    exactly twice — one map-side-combined groupBy to ≤ |batches|
    max-timestamp rows, one final hour aggregate; the prior-max
    window sorts only the |batches|-row aggregate, and the
    per-batch watermark returns to the corpus by broadcast join.
    All comparisons are integer microseconds."""
    jitter = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(LATE_JITTER_US),
    )
    ev = load_table(spark, sf_dir, "events").select(
        "ts",
        F.unix_micros("ts").alias("us"),
        F.floor(
            (F.unix_micros("ts") + jitter) / F.lit(LATE_TRIGGER_US)
        ).alias("batch_id"),
    )
    batch_max = ev.groupBy("batch_id").agg(F.max("us").alias("max_us"))
    # watermark visible to batch b = running max over batches < b
    w_prior = Window.orderBy("batch_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm = batch_max.select(
        "batch_id",
        (F.max("max_us").over(w_prior) - F.lit(LATE_DELAY_US)).alias("wm_us"),
    )
    tagged = ev.join(F.broadcast(wm), "batch_id").withColumn(
        "is_late",
        F.col("wm_us").isNotNull() & (F.col("us") < F.col("wm_us")),
    )
    return (
        tagged.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"))
        .agg(
            F.sum(F.when(~F.col("is_late"), 1).otherwise(0))
            .cast("long")
            .alias("n_on_time"),
            F.sum(F.when(F.col("is_late"), 1).otherwise(0))
            .cast("long")
            .alias("n_late_dropped"),
        )
    )


def ts_cross_correlation_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Streaming twin of `operators.behavior.ts_cross_correlation`:
    the stream maintains ONLY the per-type daily count rollup (an
    ordinary windowed agg); the zero-filled spine, lag alignment,
    and exact moment fold — full-series statistics no streaming agg
    expresses — re-run over the drained O(days × types) aggregate
    per drain (`cross_correlation_over_daily`), the decompose/ACF
    twin split. Per-drain re-evaluation is the semantics: each
    drain re-states the lead/lag matrix of everything seen."""
    from dbt_eamples_spark.operators.behavior import (
        cross_correlation_over_daily,
    )

    ev = _events_stream(spark, sf_dir)
    daily = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("x"))
        .select("event_type", F.to_date("w.start").alias("day"), "x")
    )
    inner = f"{out_table}__daily"
    _drain(daily, "complete", checkpoint, inner)
    cross_correlation_over_daily(
        spark.table(inner)
    ).createOrReplaceTempView(out_table)


def ts_rolling_median_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Streaming twin of `operators.behavior.ts_rolling_median`:
    the stream maintains ONLY the per-type daily count rollup (an
    ordinary windowed agg); the zero-fill spine and the bounded
    7-row median frame — full-series constructs — re-run over the
    drained O(days × types) aggregate per drain
    (`rolling_median_over_daily`), the ewma/xcorr twin split. Each
    drain re-states the rolling baseline of everything seen."""
    from dbt_eamples_spark.operators.behavior import (
        rolling_median_over_daily,
    )

    ev = _events_stream(spark, sf_dir)
    daily = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("x"))
        .select("event_type", F.to_date("w.start").alias("day"), "x")
    )
    inner = f"{out_table}__daily"
    _drain(daily, "complete", checkpoint, inner)
    rolling_median_over_daily(
        spark.table(inner)
    ).createOrReplaceTempView(out_table)


def ts_hampel_outliers_streaming(
    spark: SparkSession, sf_dir: str, checkpoint: str, out_table: str
) -> None:
    """Streaming twin of `operators.behavior.ts_hampel_outliers`:
    the stream maintains ONLY the per-type daily count rollup; the
    zero-fill spine, frame-list window, and in-row integer Hampel
    math re-run over the drained O(days × types) aggregate per
    drain (`hampel_over_daily`, the rolling-median twin split)."""
    from dbt_eamples_spark.operators.behavior import hampel_over_daily

    ev = _events_stream(spark, sf_dir)
    daily = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("x"))
        .select("event_type", F.to_date("w.start").alias("day"), "x")
    )
    inner = f"{out_table}__daily"
    _drain(daily, "complete", checkpoint, inner)
    hampel_over_daily(spark.table(inner)).createOrReplaceTempView(
        out_table
    )

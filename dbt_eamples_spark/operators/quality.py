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

from pyspark.sql import DataFrame, SparkSession, Window
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


Z_THRESHOLD = 3.0


def agg_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type statistical outliers in the event stream: rows whose
    value sits more than ``Z_THRESHOLD`` sample standard deviations
    from their event type's mean — the anomaly filter a training
    pipeline runs before trusting a numeric field (the reference's
    pipeline appends raw values unchecked,
    /root/reference/helix-flow/utils/postgres_client.py:34-48).

    Plan: one ``groupBy(event_type)`` computes per-type moments from
    fixed-point integer-cents sums (n, Σx, Σx²) — order-independent
    and engine-exact, unlike a float ``stddev`` fold; the moment
    table (≤ |event types| rows) broadcasts back onto a second scan
    and the z filter runs map-side. No window over the fact table —
    a ``partitionBy(event_type)`` window would shuffle the full
    corpus into ≤ |types| partitions (a skew collapse at scale);
    the broadcast join costs one tiny build instead. Mean/std/z are
    derived from the bigint sums with the same double expression
    tree on both engines (+,-,*,/ and sqrt are IEEE-exact), so the
    4dp-rounded z matches the oracle bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    moments = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s1"),
        F.sum(cents * cents).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    # sample variance in cents²: (Σx² − (Σx)²/n) / (n−1)
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    z = (cents.cast("double") - mean) / F.sqrt(var)
    return (
        ev.join(F.broadcast(moments), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value"), 2).alias("value"),
            F.round(z, 4).alias("z_score"),
        )
        .filter(F.abs(F.col("z_score")) > Z_THRESHOLD)
    )


MAD_K = 5  # |x - median| > K * MAD flags an outlier


def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    heavy-tail-safe twin of :func:`agg_zscore_outliers`: mean/stddev
    are dragged by the very outliers they're meant to flag, while
    the median/MAD breakdown point is 50%. Flags events with
    ``|value − median| > MAD_K · MAD`` per event_type.

    Plan: two grouped EXACT percentile passes (median, then MAD over
    the broadcast-joined residuals) + a broadcast filter pass. Exact
    ``percentile`` buffers a group's values, which is fine for the
    per-type profile here (the oracle needs exactness); the 100 TB
    first pass swaps in ``percentile_approx`` exactly as
    agg_approx_percentiles twins agg_percentiles. Median/MAD doubles
    come from the same interpolation in both engines
    (percentile ≡ quantile_cont — the agg_percentiles parity)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    j = ev.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
    )
    out = ev.join(F.broadcast(mad), "event_type").filter(
        F.abs(F.col("value") - F.col("med")) > MAD_K * F.col("mad")
    )
    return out.select(
        "event_id",
        "event_type",
        "value",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
    )


PROFILE_TABLE = "events"


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profile — one row per column with row,
    null and exact distinct counts: the discovery pass every
    warehouse/catalog runs before trusting a new feed (the dbt
    `source freshness`/profiling surface; pairs with
    dq_schema_tests, which asserts EXPECTED properties while this
    MEASURES them).

    Plan: ONE aggregation over the table computing count/nulls/
    distinct for every column together; multiple exact COUNT
    DISTINCTs compile to Catalyst's Expand (one duplicated stream
    per distinct column) — the documented cost of exactness, paid
    once per profile run; the 100 TB first pass swaps
    approx_count_distinct exactly as the approx-percentile twins do.
    The single wide row is then unpivoted driver-side into
    |columns| rows (bounded by schema width, not data)."""
    df = load_table(spark, sf_dir, PROFILE_TABLE)
    cols = df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    pairs = []
    for c in cols:
        pairs.append(F.lit(c))
        pairs.append(
            F.struct(
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
            )
        )
    stacked = wide.select(
        F.explode(F.create_map(*pairs)).alias("column_name", "st")
    )
    return stacked.select(
        "column_name",
        F.col("st.n_rows").alias("n_rows"),
        F.col("st.n_nulls").alias("n_nulls"),
        F.col("st.n_distinct").alias("n_distinct"),
    )


# ---- dbt source freshness ---------------------------------------------------
# pinned as-of instant: the fixture event log ends 2024-01-30; a
# wall-clock now() would make the check non-reproducible and
# non-oracle-checkable, so freshness evaluates against this constant
# (production passes now() explicitly per run)
FRESHNESS_AS_OF = "2024-02-01 00:00:00"
FRESHNESS_SOURCES = (  # (source_name, table, loaded-at column)
    ("events", "events", "ts"),
    ("orders", "orders", "o_orderdate"),
    ("lineitem", "lineitem", "l_shipdate"),
)
FRESHNESS_WARN_H = 48
FRESHNESS_ERROR_H = 24 * 30


def dq_source_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dbt source freshness``: per declared source, the newest
    loaded-at value, its staleness against the as-of instant, and
    the warn/error verdict from the configured thresholds — the
    report dbt prints from a source's ``freshness:`` block
    (reference project wiring: `/root/reference/dbt_project/
    profiles.yml` sources feed 15-min DAGs, `transactions_dag.py`).

    Staleness is computed in INTEGER SECONDS (unix-epoch
    subtraction) then floor-divided to hours — engine-exact, no
    interval/float arithmetic. Each source costs one max-aggregate
    (map-side combined to a single row); the three scans share
    nothing by design — freshness must not wait on a fused pass at
    100 TB, it reads each table's footer-level max when the format
    provides it (parquet max statistics make this near-free)."""
    frames = []
    for name, table, col in FRESHNESS_SOURCES:
        t = load_table(spark, sf_dir, table)
        mx = t.agg(F.max(F.col(col).cast("timestamp")).alias("max_loaded_at"))
        stale_h = F.expr(
            f"(unix_timestamp(TIMESTAMP '{FRESHNESS_AS_OF}') "
            f"- unix_timestamp(max_loaded_at)) DIV 3600"
        )
        frames.append(
            mx.select(
                F.lit(name).alias("source_name"),
                F.date_format("max_loaded_at", "yyyy-MM-dd HH:mm:ss").alias(
                    "max_loaded_at"
                ),
                stale_h.cast("long").alias("staleness_hours"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    status = (
        F.when(F.col("staleness_hours") >= FRESHNESS_ERROR_H, F.lit("error"))
        .when(F.col("staleness_hours") >= FRESHNESS_WARN_H, F.lit("warn"))
        .otherwise(F.lit("fresh"))
    )
    return out.select(
        "source_name", "max_loaded_at", "staleness_hours", status.alias("status")
    )


# ---- dbt-utils advanced test pack ------------------------------------------
PRICE_RANGE = (0.0, 1_000_000.0)


def dq_advanced_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dbt-utils test pack beyond core's four generic tests
    (`dq_schema_tests`): accepted_range, unique_combination_of
    _columns, fewer_rows_than, and mutually_exclusive_ranges — the
    last one run against the engine's OWN scd2 output (validity
    intervals per user must not overlap), so the test suite
    exercises a derived model exactly as a dbt project would.

    Scale shape: each test is one aggregate / grouped count;
    mutually_exclusive_ranges sorts within user partitions only
    (the scd2 history is per-user bounded). One report row per
    test, same shape as dq_schema_tests."""
    from dbt_eamples_spark.streaming.incremental import scd2_snapshot

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    rng = o.agg(
        F.count_if(
            ~F.col("o_totalprice").between(*PRICE_RANGE)
        ).alias("n_violations")
    ).select(
        F.lit("accepted_range_o_totalprice").alias("test_name"),
        "n_violations",
    )
    combo = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("unique_combination_orderkey_linenumber").alias(
                "test_name"
            ),
            "n_violations",
        )
    )
    # fewer_rows_than: orders must have fewer rows than lineitem
    fewer = (
        o.agg(F.count("*").alias("a"))
        .crossJoin(li.agg(F.count("*").alias("b")))
        .select(
            F.lit("fewer_rows_than_orders_lt_lineitem").alias("test_name"),
            F.when(F.col("a") < F.col("b"), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("n_violations"),
        )
    )
    hist = scd2_snapshot(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("valid_from")
    overlap = (
        hist.withColumn("next_from", F.lead("valid_from").over(wu))
        .filter(
            F.col("next_from").isNotNull()
            & (F.col("valid_to") > F.col("next_from"))
        )
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("mutually_exclusive_ranges_scd2_validity").alias(
                "test_name"
            ),
            "n_violations",
        )
    )
    report = rng.unionByName(combo).unionByName(fewer).unionByName(overlap)
    return report.select(
        "test_name",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


# ---- distribution drift (PSI) -----------------------------------------------
PSI_BINS = 10
PSI_BIN_WIDTH = 50.0  # event value bins [0, 50), [50, 100), ... clamp


def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the first and second half
    of the observation window, over the event-value distribution —
    THE production ML-monitoring drift statistic (PSI < 0.1 stable,
    0.1-0.25 shifting, > 0.25 drifted). Catches the silent
    distribution change that per-row dq tests can't.

    Semantics, stated exactly: periods split at the midpoint
    epoch-day ((min+max) DIV 2, ref = days <= mid); bins are
    fixed-width value bands (clamped top bin, the agg_histogram
    binning); counts get +1 Laplace smoothing so empty bins
    contribute a finite term. Each bin's term (p_cur - p_ref) *
    ln(p_cur / p_ref) evaluates the IDENTICAL expression tree in
    both engines, then converts ONCE to fixed-point
    (round(term * 1e9) as BIGINT) — the total PSI is an
    order-independent integer sum, immune to float summation order
    (the PMI preround lesson, applied to a cross-row sum).

    Plan: one corpus scan → (period, bin) hash-agg (map-side
    combined, ≤ 2 x PSI_BINS rows); everything after is
    bounded-grid arithmetic with a window total."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts"))),
            F.lit("1970-01-01"),
        ).alias("dn"),
        F.least(
            F.greatest(
                F.floor(F.col("value") / PSI_BIN_WIDTH).cast("long"),
                F.lit(0),
            ),
            F.lit(PSI_BINS - 1),
        ).alias("bin_id"),
    )
    bounds = base.agg(
        F.expr("(min(dn) + max(dn)) DIV 2").alias("mid")
    )
    counts = (
        base.crossJoin(F.broadcast(bounds))
        .groupBy("bin_id")
        .agg(
            F.sum(F.when(F.col("dn") <= F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_ref"),
            F.sum(F.when(F.col("dn") > F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_cur"),
        )
    )
    wall = Window.partitionBy()
    tot_ref = F.sum(F.col("n_ref") + 1).over(wall)
    tot_cur = F.sum(F.col("n_cur") + 1).over(wall)
    p_ref = (F.col("n_ref") + 1) / tot_ref
    p_cur = (F.col("n_cur") + 1) / tot_cur
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    g = counts.select(
        "bin_id",
        "n_ref",
        "n_cur",
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cur, 6).alias("p_cur"),
        F.round(term, 6).alias("psi_term"),
        F.round(F.lit(1e9) * term).cast("long").alias("term_fp"),
    )
    psi = F.sum("term_fp").over(Window.partitionBy())
    return g.select(
        "bin_id",
        "n_ref",
        "n_cur",
        "p_ref",
        "p_cur",
        "psi_term",
        F.round(psi / F.lit(1e9), 6).alias("psi_total"),
    ).drop("term_fp")


# Benford expected first-digit shares, pinned as LITERAL doubles
# (repr of python math.log10(1 + 1/d)) and rendered into both the
# Spark expression and the DuckDB oracle — the cross-engine contract
# is literal equality, never two libm log10 calls agreeing.
BENFORD_EXPECTED = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over gross line revenue —
    the classic forensic-accounting / data-quality test (Nigrini
    1996): fabricated or truncated monetary values drift from the
    log10(1+1/d) first-digit distribution that multiplicative
    processes follow. One row per observed leading digit with the
    observed share, the Benford expectation, and the absolute
    deviation; the screen's verdict is the deviation column read
    against the analyst's tolerance (synthetic uniform-ish fixture
    prices deviate by design — the point is the measurement).

    Engine-exact: the digit is the first character of the integer
    cents value (cents = round(price·100), the repo-standard exact
    money form — never float log10 on the value). share and
    abs_dev evaluate the IDENTICAL IEEE tree both engines:
    count/count division, subtraction of the pinned literal, abs,
    round(6).

    Plan: one map-side-combined hash-agg over the scan onto a
    9-row digit grid; the total attaches via a single-partition
    window over those 9 rows (bounded by construction). Zero extra
    corpus passes."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    hist = (
        li.select(
            F.substring(cents.cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n_obs"))
    )
    expected = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for d, e in sorted(BENFORD_EXPECTED.items())
                for x in (d, e)
            ]
        ),
        F.col("digit"),
    )
    total = F.sum("n_obs").over(Window.partitionBy())
    share = F.col("n_obs") / F.col("n_total")
    return (
        hist.select(
            "digit", "n_obs", total.alias("n_total"), expected.alias(
                "expected_share"
            )
        )
        .select(
            "digit",
            "n_obs",
            F.round(share, 6).alias("share"),
            "expected_share",
            F.round(
                F.abs(share - F.col("expected_share")), 6
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


WINSOR_P = 0.05  # clip tails at p05/p95


def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clip values to the exact
    [p05, p95] band, then average — the robust location estimate a
    metrics pipeline reports when the raw mean is dragged by the
    heavy tail (`agg_mad_outliers` flags the tail; this SUMMARIZES
    despite it). Reports the raw mean and the clipped-row count
    alongside so the drag is visible.

    Engine-exact: the percentile bounds come from the same
    interpolation in both engines (percentile ≡ quantile_cont — the
    agg_percentiles parity); clipped values re-quantize to 1e4
    fixed point and raw values to integer cents, so both means are
    ONE double division of exact int64 sums.

    Plan: one grouped exact-percentile pass (type-bounded output,
    broadcast back) + one aggregate pass — two corpus scans, one
    type-keyed exchange each, the approx-percentile swap documented
    for the 100 TB first pass exactly as agg_mad_outliers."""
    ev = load_table(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.expr(f"percentile(value, {WINSOR_P})").alias("lo"),
        F.expr(f"percentile(value, {1 - WINSOR_P})").alias("hi"),
    )
    j = ev.join(F.broadcast(pct), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        j.select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.round(clipped * 1e4).cast("long").alias("c_fp"),
            (
                (F.col("value") < F.col("lo"))
                | (F.col("value") > F.col("hi"))
            )
            .cast("int")
            .alias("was_clipped"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("was_clipped").cast("long").alias("n_clipped"),
            F.round(
                F.sum("cents").cast("double") / 100.0
                / F.count("*").cast("double"),
                6,
            ).alias("raw_mean"),
            F.round(
                F.sum("c_fp").cast("double") / 1e4
                / F.count("*").cast("double"),
                6,
            ).alias("winsor_mean"),
        )
        .orderBy("event_type")
    )

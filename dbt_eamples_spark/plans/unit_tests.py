"""Model unit tests over the metric compiler (VERDICT r7 #7) — the
dbt 1.8 `unit_tests:` surface: literal mocked input rows + expected
output rows for a compiled model, executed through the REAL compiler
(plans/compiler.py) and diffed exactly.

Reference semantics: dbt's model unit test mocks each ref'd/sourced
relation with `given` fixture rows (unspecified columns default to
NULL), builds the model's compiled SQL against those mocks, and
fails unless the result set equals `expect` exactly (row multiset —
order-insensitive unless the model orders). This module is that
contract for the engine's compiled metric models:

 - ``given`` rows register as temp views that SHADOW the physical
   fixture tables for exactly the duration of the test (dropped in
   a finally — the catalog is restored even on a failing diff);
 - schemas come from the real catalog (the parquet fixture), so a
   mocked column must exist and carries the model's real type —
   exactly dbt's "fixtures are validated against the model schema";
 - the diff is EXACT (no float tolerance): the compiled SQL rounds
   every metric (ROUND_DECIMALS), so hand-computable fixtures are
   bit-stable, the same reason the DuckDB oracle twins hash-match.

`UNIT_TESTS` ships golden fixtures for every metric class the
compiler can emit: simple (one aggregated measure), ratio
(numerator/denominator), derived (expression over sibling metrics,
inlined into one pass), and — round 9 (VERDICT r8 #5) — the three
windowed/funnel classes: cumulative (running total over the time
grain), growth (period-over-period LAG fraction, incl. the
first-period-NULL and the −0.0-normalization paths), and conversion
(the MetricFlow funnel: in-window match, multi-conversion dedup,
pre-base purchases ignored).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.plans.compiler import (
    MetricQueryRequest,
    compile_request,
)
from dbt_eamples_spark.plans.semantics import Registry


@dataclass(frozen=True)
class ModelUnitTest:
    """One dbt-style unit test: mock rows in, expected rows out."""

    name: str
    request: MetricQueryRequest
    given: dict[str, tuple[dict, ...]]  # physical table -> mock rows
    expect: tuple[dict, ...]  # expected output rows (all columns)


@dataclass
class UnitTestResult:
    name: str
    passed: bool
    actual: list[dict] = field(default_factory=list)
    expected: list[dict] = field(default_factory=list)
    message: str = ""


def _canon(rows: list[dict]) -> list[tuple]:
    """Order-insensitive canonical form: rows as sorted tuples of
    (column, repr(value)) — repr so 70.0 and 70 diff loudly instead
    of comparing equal across a type regression."""
    return sorted(
        tuple((k, repr(v)) for k, v in sorted(r.items())) for r in rows
    )


def run_unit_test(
    spark: SparkSession,
    test: ModelUnitTest,
    schema_dir: str,
    registry: Registry | None = None,
) -> UnitTestResult:
    """Compile the request, shadow every table it reads with the
    test's mocked rows (missing columns NULL, dbt semantics), run
    the compiled SQL, diff exactly."""
    compiled = compile_request(test.request, registry)
    shadowed: list[str] = []
    try:
        for table in compiled.tables:
            schema = load_table(spark, schema_dir, table).schema
            names = {f.name for f in schema.fields}
            rows = test.given.get(table, ())
            for r in rows:
                unknown = set(r) - names
                if unknown:
                    raise ValueError(
                        f"unit test {test.name}: mocked columns "
                        f"{sorted(unknown)} not in {table}'s schema"
                    )
            data = [
                tuple(r.get(f.name) for f in schema.fields) for r in rows
            ]
            spark.createDataFrame(data, schema).createOrReplaceTempView(
                table
            )
            shadowed.append(table)
        actual = [r.asDict() for r in spark.sql(compiled.sql).collect()]
    finally:
        for table in shadowed:
            spark.catalog.dropTempView(table)
        if shadowed:
            # the shadow views replaced whatever register_tables had
            # registered, and its idempotence memo would make the
            # next compiled-metric execution skip re-registering —
            # leaving the catalog EMPTY where the caller expects the
            # physical fixture views. Invalidate the memo so the
            # next call re-registers (caught by the full-suite run:
            # a prior test had warmed the memo).
            from dbt_eamples_spark import catalog

            catalog.invalidate_registered_tables()
    want = [dict(r) for r in test.expect]
    if _canon(actual) == _canon(want):
        return UnitTestResult(test.name, True, actual, want, "ok")
    return UnitTestResult(
        test.name,
        False,
        actual,
        want,
        f"expected {sorted(_canon(want))} got {sorted(_canon(actual))}",
    )


def run_all(
    spark: SparkSession,
    schema_dir: str,
    tests: tuple[ModelUnitTest, ...] | None = None,
) -> list[UnitTestResult]:
    return [
        run_unit_test(spark, t, schema_dir)
        for t in (tests or UNIT_TESTS)
    ]


# ---- golden fixtures: every compiled metric class ---------------------------
# Hand-computable rows; every expectation is exact after the
# compiler's ROUND(…, 2) (6dp for growth/conversion rates).
_TS = _dt.datetime
_LI_ROWS = (
    # A-flag: 100·0.9 = 90 and 50·1.0 = 50 → revenue 140, gross 150
    {"l_returnflag": "A", "l_extendedprice": 100.0, "l_discount": 0.10},
    {"l_returnflag": "A", "l_extendedprice": 50.0, "l_discount": 0.00},
    # R-flag: 200·0.75 = 150 → revenue 150, gross 200
    {"l_returnflag": "R", "l_extendedprice": 200.0, "l_discount": 0.25},
)

UNIT_TESTS: tuple[ModelUnitTest, ...] = (
    ModelUnitTest(
        name="simple_revenue_by_returnflag",
        request=MetricQueryRequest(
            metrics=("revenue",), group_by=("returnflag",)
        ),
        given={"lineitem": _LI_ROWS},
        expect=(
            {"returnflag": "A", "revenue": 140.0},
            {"returnflag": "R", "revenue": 150.0},
        ),
    ),
    ModelUnitTest(
        name="ratio_revenue_per_item",
        request=MetricQueryRequest(
            metrics=("revenue_per_item",), group_by=("returnflag",)
        ),
        given={"lineitem": _LI_ROWS},
        expect=(
            {"returnflag": "A", "revenue_per_item": 70.0},  # 140/2
            {"returnflag": "R", "revenue_per_item": 150.0},  # 150/1
        ),
    ),
    ModelUnitTest(
        name="cumulative_running_revenue_monthly",
        request=MetricQueryRequest(
            metrics=("revenue", "cum_revenue"),
            group_by=("shipdate__month",),
        ),
        given={
            "lineitem": (
                # Jan: 100·0.9 = 90; Feb: 50 + 200·0.75 = 200;
                # Mar: 10 → running 90, 290, 300
                {"l_extendedprice": 100.0, "l_discount": 0.10,
                 "l_shipdate": _TS(1995, 1, 10)},
                {"l_extendedprice": 50.0, "l_discount": 0.00,
                 "l_shipdate": _TS(1995, 2, 5)},
                {"l_extendedprice": 200.0, "l_discount": 0.25,
                 "l_shipdate": _TS(1995, 2, 20)},
                {"l_extendedprice": 10.0, "l_discount": 0.00,
                 "l_shipdate": _TS(1995, 3, 1)},
            )
        },
        expect=(
            {"shipdate__month": _TS(1995, 1, 1), "revenue": 90.0,
             "cum_revenue": 90.0},
            {"shipdate__month": _TS(1995, 2, 1), "revenue": 200.0,
             "cum_revenue": 290.0},
            {"shipdate__month": _TS(1995, 3, 1), "revenue": 10.0,
             "cum_revenue": 300.0},
        ),
    ),
    ModelUnitTest(
        name="growth_pop_revenue_by_flag",
        request=MetricQueryRequest(
            metrics=("revenue", "revenue_growth"),
            group_by=("returnflag", "shipdate__month"),
        ),
        given={
            "lineitem": (
                # A: 90 → 200 → 200: first period NULL, then
                # (200−90)/90 = 1.222222, then the flat period hits
                # the −0.0-normalization CASE and emits +0.0
                {"l_returnflag": "A", "l_extendedprice": 100.0,
                 "l_discount": 0.10, "l_shipdate": _TS(1995, 1, 10)},
                {"l_returnflag": "A", "l_extendedprice": 200.0,
                 "l_discount": 0.00, "l_shipdate": _TS(1995, 2, 5)},
                {"l_returnflag": "A", "l_extendedprice": 200.0,
                 "l_discount": 0.00, "l_shipdate": _TS(1995, 3, 15)},
                # R: a single period stays NULL (LAG partition
                # restart — growth never leaks across flags)
                {"l_returnflag": "R", "l_extendedprice": 10.0,
                 "l_discount": 0.00, "l_shipdate": _TS(1995, 3, 1)},
            )
        },
        expect=(
            {"returnflag": "A", "shipdate__month": _TS(1995, 1, 1),
             "revenue": 90.0, "revenue_growth": None},
            {"returnflag": "A", "shipdate__month": _TS(1995, 2, 1),
             "revenue": 200.0, "revenue_growth": 1.222222},
            {"returnflag": "A", "shipdate__month": _TS(1995, 3, 1),
             "revenue": 200.0, "revenue_growth": 0.0},
            {"returnflag": "R", "shipdate__month": _TS(1995, 3, 1),
             "revenue": 10.0, "revenue_growth": None},
        ),
    ),
    ModelUnitTest(
        name="conversion_view_to_purchase_daily",
        request=MetricQueryRequest(
            metrics=("view_to_purchase",),
            group_by=("event_time__day",),
        ),
        given={
            "events": (
                # u1 views day 1, purchases twice inside the 7-day
                # window → ONE conversion (DISTINCT base-key dedup)
                {"event_id": 1, "ts": _TS(2024, 1, 1, 9),
                 "user_id": 1, "event_type": "view"},
                {"event_id": 2, "ts": _TS(2024, 1, 3, 9),
                 "user_id": 1, "event_type": "purchase"},
                {"event_id": 3, "ts": _TS(2024, 1, 4, 9),
                 "user_id": 1, "event_type": "purchase"},
                # u2 views day 1; its only purchase PRECEDES the
                # view → no conversion
                {"event_id": 4, "ts": _TS(2024, 1, 1, 10),
                 "user_id": 2, "event_type": "view"},
                {"event_id": 7, "ts": _TS(2023, 12, 30, 9),
                 "user_id": 2, "event_type": "purchase"},
                # u3 views day 2, purchases on day 12 — OUTSIDE the
                # 7-day window → no conversion
                {"event_id": 5, "ts": _TS(2024, 1, 2, 8),
                 "user_id": 3, "event_type": "view"},
                {"event_id": 6, "ts": _TS(2024, 1, 12, 9),
                 "user_id": 3, "event_type": "purchase"},
            )
        },
        expect=(
            {"event_time__day": _TS(2024, 1, 1),
             "view_to_purchase_opportunities": 2,
             "view_to_purchase_conversions": 1,
             "view_to_purchase": 0.5},
            {"event_time__day": _TS(2024, 1, 2),
             "view_to_purchase_opportunities": 1,
             "view_to_purchase_conversions": 0,
             "view_to_purchase": 0.0},
        ),
    ),
    ModelUnitTest(
        name="derived_discount_amount",
        request=MetricQueryRequest(
            metrics=("gross_revenue", "revenue", "discount_amount"),
            group_by=("returnflag",),
        ),
        given={"lineitem": _LI_ROWS},
        expect=(
            {
                "returnflag": "A",
                "gross_revenue": 150.0,
                "revenue": 140.0,
                "discount_amount": 10.0,
            },
            {
                "returnflag": "R",
                "gross_revenue": 200.0,
                "revenue": 150.0,
                "discount_amount": 50.0,
            },
        ),
    ),
)

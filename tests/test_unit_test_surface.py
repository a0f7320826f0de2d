"""dbt-1.8-style model unit tests (VERDICT r7 #7): literal mocked
inputs through the REAL metric compiler, exact row diffs, catalog
restored after shadowing — plus the failure path (a wrong
expectation must fail loudly, not silently pass)."""

from __future__ import annotations

import pytest

from dbt_eamples_spark.plans.unit_tests import (
    UNIT_TESTS,
    ModelUnitTest,
    run_all,
    run_unit_test,
)


def test_golden_fixtures_pass(spark, sf_dir):
    results = run_all(spark, sf_dir)
    assert [r.name for r in results] == [t.name for t in UNIT_TESTS]
    for r in results:
        assert r.passed, f"{r.name}: {r.message}"
    # every compiled metric class exercised (r9: + the windowed and
    # funnel classes, VERDICT r8 #5)
    assert {t.name.split("_")[0] for t in UNIT_TESTS} == {
        "simple",
        "ratio",
        "derived",
        "cumulative",
        "growth",
        "conversion",
    }


def test_wrong_expectation_fails(spark, sf_dir):
    t0 = UNIT_TESTS[0]
    bad = ModelUnitTest(
        name="bad",
        request=t0.request,
        given=t0.given,
        expect=({"returnflag": "A", "revenue": 999.0},),
    )
    r = run_unit_test(spark, bad, sf_dir)
    assert not r.passed
    assert "expected" in r.message


def test_unknown_mock_column_rejected(spark, sf_dir):
    t0 = UNIT_TESTS[0]
    bad = ModelUnitTest(
        name="bad_col",
        request=t0.request,
        given={"lineitem": ({"no_such_col": 1},)},
        expect=(),
    )
    with pytest.raises(ValueError, match="not in lineitem's schema"):
        run_unit_test(spark, bad, sf_dir)


def test_shadowing_is_restored(spark, sf_dir):
    """After a unit test the physical fixture is visible again: the
    same compiled query returns fixture-scale rows, not mock rows."""
    from dbt_eamples_spark.plans.compiler import execute

    run_all(spark, sf_dir)
    c = execute(spark, sf_dir, UNIT_TESTS[0].request)
    n = c.df.count()
    assert n >= 2  # fixture has >= the mock's two flags
    total = sum(r.revenue for r in c.df.collect())
    assert total > 1000  # mock world was 290.0 — this is the corpus


def test_windowed_class_failure_paths(spark, sf_dir):
    """The round-9 windowed/funnel fixtures fail LOUDLY on the
    regressions they exist to catch: a wrong running total, a
    growth first-period 0-instead-of-NULL, and a conversion count
    that ignores the window."""
    by_name = {t.name: t for t in UNIT_TESTS}

    cum = by_name["cumulative_running_revenue_monthly"]
    bad_rows = tuple(
        {**r, "cum_revenue": 999.0} if i == 2 else r
        for i, r in enumerate(cum.expect)
    )
    r = run_unit_test(
        spark,
        ModelUnitTest("bad_cum", cum.request, cum.given, bad_rows),
        sf_dir,
    )
    assert not r.passed and "expected" in r.message

    gr = by_name["growth_pop_revenue_by_flag"]
    # NULL first period is part of the contract: 0.0 must NOT pass
    bad_rows = tuple(
        {**r, "revenue_growth": 0.0}
        if r["revenue_growth"] is None and r["returnflag"] == "A"
        else r
        for r in gr.expect
    )
    r = run_unit_test(
        spark,
        ModelUnitTest("bad_growth", gr.request, gr.given, bad_rows),
        sf_dir,
    )
    assert not r.passed

    conv = by_name["conversion_view_to_purchase_daily"]
    # counting the outside-window purchase would flip day 2 to 1.0
    bad_rows = tuple(
        {**r, "view_to_purchase_conversions": 1, "view_to_purchase": 1.0}
        if r["view_to_purchase_conversions"] == 0
        else r
        for r in conv.expect
    )
    r = run_unit_test(
        spark,
        ModelUnitTest("bad_conv", conv.request, conv.given, bad_rows),
        sf_dir,
    )
    assert not r.passed

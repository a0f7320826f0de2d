"""Round-5 fourth-wave operators: k-core peeling, exact-integer
autocorrelation, Benford first-digit screen."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table


# ---- graph_kcore ------------------------------------------------------------
def _python_kcore(edges, k):
    """Synchronous peel to fixpoint on a directed symmetric edge
    set — the operator's spec, independently in pure python."""
    E = list(edges)
    while True:
        deg = collections.Counter(s for s, _ in E)
        keep = {n for n, d in deg.items() if d >= k}
        E2 = [(s, d) for s, d in E if s in keep and d in keep]
        if len(E2) == len(E):
            return collections.Counter(s for s, _ in E2)
        E = E2


def test_kcore_matches_python_peel(spark, sf_dir):
    from dbt_eamples_spark.operators.graph import (
        KCORE_K,
        _copurchase_edges,
        graph_kcore,
    )

    edges = {
        (r.src, r.dst)
        for r in _copurchase_edges(spark, sf_dir).collect()
    }
    want = _python_kcore(edges, KCORE_K)
    got = {
        r.l_partkey: r.core_deg for r in graph_kcore(spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_kcore_members_keep_k_neighbors_inside_core(spark, sf_dir):
    from dbt_eamples_spark.operators.graph import KCORE_K, graph_kcore

    rows = graph_kcore(spark, sf_dir).collect()
    # the defining invariant: every member's WITHIN-CORE degree >= K
    for r in rows:
        assert r.core_deg >= KCORE_K


def test_kcore_converges_within_round_cap(spark, sf_dir):
    """The fixture must reach the fixpoint inside KCORE_ROUNDS —
    otherwise the round cap (not the data) defines the result and
    this lock forces the cap to be revisited."""
    from dbt_eamples_spark.operators.graph import (
        KCORE_K,
        KCORE_ROUNDS,
        _copurchase_edges,
    )

    E = [(r.src, r.dst) for r in _copurchase_edges(spark, sf_dir).collect()]
    for i in range(KCORE_ROUNDS + 1):
        deg = collections.Counter(s for s, _ in E)
        keep = {n for n, d in deg.items() if d >= KCORE_K}
        E2 = [(s, d) for s, d in E if s in keep and d in keep]
        if len(E2) == len(E):
            break
        E = E2
    assert i < KCORE_ROUNDS, "peel did not converge inside the cap"


# ---- ts_autocorrelation -----------------------------------------------------
def _python_acf(spark, sf_dir, max_lag):
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        )
        .agg(F.count("*").alias("x"))
        .collect()
    )
    series = collections.defaultdict(dict)
    for r in daily:
        series[r.event_type][r.day] = r.x
    out = {}
    for et, by_day in series.items():
        n, s = len(by_day), sum(by_day.values())
        cx = {d: n * x - s for d, x in by_day.items()}
        den = sum(v * v for v in cx.values())
        import datetime

        for lag in range(1, max_lag + 1):
            num, pairs = 0, 0
            for d, v in cx.items():
                prev = cx.get(d - datetime.timedelta(days=lag))
                if prev is not None:
                    num += v * prev
                    pairs += 1
            out[(et, lag)] = (pairs, num, den)
    return out


def test_acf_matches_exact_python_sums(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import (
        ACF_MAX_LAG,
        ts_autocorrelation,
    )

    want = _python_acf(spark, sf_dir, ACF_MAX_LAG)
    rows = ts_autocorrelation(spark, sf_dir).collect()
    got_keys = set()
    for r in rows:
        pairs, num, den = want[(r.event_type, r.lag)]
        got_keys.add((r.event_type, r.lag))
        assert r.n_pairs == pairs
        if den == 0:
            assert r.acf is None
        else:
            assert abs(r.acf - num / den) < 5.1e-7  # round(6) quantum
            assert -1.000001 <= r.acf <= 1.000001
    # every (type, lag) with at least one pair is reported
    assert got_keys == {k for k, (p, _, _) in want.items() if p > 0}


def test_acf_lag_grid_is_complete_on_gapless_series(spark, sf_dir):
    """The fixture calendar has no empty days per type, so lag k
    must pair exactly n_days - k times."""
    from dbt_eamples_spark.operators.behavior import ts_autocorrelation

    ev = load_table(spark, sf_dir, "events")
    n_days = (
        ev.groupBy(
            "event_type", F.to_date(F.date_trunc("day", F.col("ts")))
        )
        .count()
        .groupBy("event_type")
        .count()
        .collect()
    )
    days = {r.event_type: r["count"] for r in n_days}
    for r in ts_autocorrelation(spark, sf_dir).collect():
        assert r.n_pairs == days[r.event_type] - r.lag


# ---- dq_benford_digits ------------------------------------------------------
def test_benford_digits_accounts_for_every_row(spark, sf_dir):
    from dbt_eamples_spark.operators.quality import (
        BENFORD_EXPECTED,
        dq_benford_digits,
    )

    rows = dq_benford_digits(spark, sf_dir).collect()
    n_rows = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_obs for r in rows) == n_rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4  # round(6) drift
    for r in rows:
        assert 1 <= r.digit <= 9
        assert r.expected_share == BENFORD_EXPECTED[r.digit]
        assert abs(r.abs_dev - abs(r.n_obs / n_rows - r.expected_share)) < 1e-6


def test_benford_digit_is_first_char_of_cents(spark, sf_dir):
    from dbt_eamples_spark.operators.quality import dq_benford_digits

    li = load_table(spark, sf_dir, "lineitem")
    want = collections.Counter(
        int(str(r.cents)[0])
        for r in li.select(
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents")
        ).collect()
    )
    got = {r.digit: r.n_obs for r in dq_benford_digits(spark, sf_dir).collect()}
    assert got == dict(want)


def test_kcore_peel_on_constructed_graph(spark):
    """6-clique with a 3-node pendant chain at k=2: the chain peels
    one node per round (the cascade), the clique survives with
    within-core degree 5 — a core known by hand."""
    from dbt_eamples_spark.operators.graph import kcore_peel

    clique = [(a, b) for a in range(1, 7) for b in range(1, 7) if a != b]
    chain = [(7, 8), (8, 7), (8, 9), (9, 8), (9, 1), (1, 9)]
    edges = spark.createDataFrame(clique + chain, ["src", "dst"])
    core = kcore_peel(edges, 2, 8)
    deg = collections.Counter(r.src for r in core.collect())
    assert deg == {n: 5 for n in range(1, 7)}

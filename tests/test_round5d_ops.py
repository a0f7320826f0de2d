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


# ---- agg_small_qty_revenue (TPC-H Q17 shape) --------------------------------
def test_small_qty_revenue_matches_python(spark, sf_dir):
    from dbt_eamples_spark.operators.relational import agg_small_qty_revenue

    li = load_table(spark, sf_dir, "lineitem").collect()
    part = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, sf_dir, "part").collect()
    }
    sums = collections.defaultdict(lambda: [0, 0])
    for r in li:
        s = sums[r.l_partkey]
        s[0] += r.l_quantity
        s[1] += 1
    brand = collections.defaultdict(lambda: [0, 0])
    for r in li:
        if r.l_quantity < 0.2 * (sums[r.l_partkey][0] / sums[r.l_partkey][1]):
            b = brand[part[r.l_partkey]]
            b[0] += 1
            b[1] += round(r.l_extendedprice * 100)
    got = {
        r.p_brand: (r.n_small_lines, r.avg_yearly)
        for r in agg_small_qty_revenue(spark, sf_dir).collect()
    }
    assert set(got) == set(brand)
    for b, (n, cents) in brand.items():
        assert got[b][0] == n
        assert abs(float(got[b][1]) - cents / 700.0) < 0.006


def test_small_qty_revenue_plan_decorrelates(spark, sf_dir):
    """Catalyst must rewrite the correlated scalar subquery to the
    per-part aggregate join — a correlated re-execution per row
    would be unrunnable at scale."""
    from dbt_eamples_spark.operators.relational import agg_small_qty_revenue

    plan = agg_small_qty_revenue(spark, sf_dir)._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert "scalar-subquery" not in plan.lower()
    assert "Aggregate" in plan


# ---- agg_skyline_per_brand --------------------------------------------------
def test_skyline_matches_brute_dominance(spark, sf_dir):
    from dbt_eamples_spark.operators.relational import agg_skyline_per_brand

    parts = [
        (r.p_brand, r.p_partkey, round(r.p_retailprice * 100), r.p_size)
        for r in load_table(spark, sf_dir, "part").collect()
    ]
    by_brand = collections.defaultdict(list)
    for b, k, p, s in parts:
        by_brand[b].append((k, p, s))
    want = set()
    for b, rows in by_brand.items():
        for k, p, s in rows:
            dominated = any(
                p2 <= p and s2 >= s and (p2 < p or s2 > s)
                for _, p2, s2 in rows
            )
            if not dominated:
                want.add((b, k))
    got = {
        (r.p_brand, r.p_partkey)
        for r in agg_skyline_per_brand(spark, sf_dir).collect()
    }
    assert got == want


# ---- events_seasonality_profile ---------------------------------------------
def test_seasonality_dow_share_and_peaks(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import (
        events_seasonality_profile,
    )

    rows = events_seasonality_profile(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").collect()
    want = collections.Counter(
        (r.event_type, r.ts.weekday(), r.ts.hour) for r in ev
    )
    got = {(r.event_type, r.dow, r.hour): r.n_events for r in rows}
    assert got == dict(want)  # dow 0 = Monday, matching weekday()
    totals = collections.Counter(r.event_type for r in ev)
    peaks = collections.defaultdict(int)
    for r in rows:
        assert abs(r.share - r.n_events / totals[r.event_type]) < 5.1e-7
        peaks[r.event_type] = max(peaks[r.event_type], r.n_events)
    for r in rows:
        assert r.is_peak == (r.n_events == peaks[r.event_type])


# ---- graph_bfs_layers -------------------------------------------------------
def test_bfs_layers_match_python_bfs(spark, sf_dir):
    from dbt_eamples_spark.operators.graph import (
        BFS_MAX_DEPTH,
        BFS_SEED_MAX,
        _copurchase_edges,
        graph_bfs_layers,
    )

    adj = collections.defaultdict(set)
    for r in _copurchase_edges(spark, sf_dir).collect():
        adj[r.src].add(r.dst)
    dist = {n: 0 for n in adj if n <= BFS_SEED_MAX}
    frontier = set(dist)
    for d in range(1, BFS_MAX_DEPTH + 1):
        nxt = {
            v for u in frontier for v in adj[u] if v not in dist
        }
        for v in nxt:
            dist[v] = d
        frontier = nxt
    got = {
        r.l_partkey: r.dist for r in graph_bfs_layers(spark, sf_dir).collect()
    }
    assert got == dist

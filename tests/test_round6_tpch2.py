"""Round-6 second TPC-H wave (Q3/Q6/Q9/Q10/Q12/Q13/Q18/Q20 shapes):
semantic cross-checks against brute-python references plus the plan
contracts the docstrings claim (decorrelation, top-k without a full
sort, full predicate pushdown)."""

from __future__ import annotations

import math
from collections import defaultdict

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators.relational import (
    DISTRIB_EXCLUDED_PRIORITY,
    LARGE_ORDER_QTY,
    LATE_SHIP_DAYS,
    PROFIT_COST_PCT,
    PROFIT_PART_TOKEN,
    SHIP_PRIORITY_CUTOFF,
    SHIP_PRIORITY_SEGMENT,
    customer_order_distribution,
    late_priority_by_year,
    nation_year_profit,
    orders_large_quantity,
    orders_shipping_priority,
    returned_item_customers,
    revenue_change_forecast,
    supplier_dominant_parts,
)


def _r(v: float) -> int:
    """HALF_UP round, matching Spark/DuckDB ROUND (python round() is
    banker's)."""
    return math.floor(v + 0.5)


def _rows(spark, sf_dir, table):
    return load_table(spark, sf_dir, table).collect()


# ---- Q3 shape ---------------------------------------------------------------
def test_shipping_priority_matches_brute(spark, sf_dir):
    segs = {
        r.c_custkey
        for r in _rows(spark, sf_dir, "customer")
        if r.c_mktsegment == SHIP_PRIORITY_SEGMENT
    }
    orders = {
        r.o_orderkey: r.o_orderdate
        for r in _rows(spark, sf_dir, "orders")
        if r.o_custkey in segs
        and str(r.o_orderdate) < SHIP_PRIORITY_CUTOFF
    }
    rev: dict[int, int] = defaultdict(int)
    for r in _rows(spark, sf_dir, "lineitem"):
        if r.l_orderkey in orders and str(r.l_shipdate) > SHIP_PRIORITY_CUTOFF + " 00:00:00":
            rev[r.l_orderkey] += _r(
                r.l_extendedprice * (1 - r.l_discount) * 100
            )
    want = sorted(
        ((v, orders[k], k) for k, v in rev.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:10]
    got = [
        (r.revenue_cents, r.o_orderdate, r.o_orderkey)
        for r in orders_shipping_priority(spark, sf_dir).collect()
    ]
    assert got == want and len(got) == 10


def test_shipping_priority_topk_no_full_sort(spark, sf_dir):
    plan = orders_shipping_priority(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---- Q6 shape ---------------------------------------------------------------
def test_revenue_forecast_matches_brute(spark, sf_dir):
    n = kept = 0
    for r in _rows(spark, sf_dir, "lineitem"):
        if (
            "1996-01-01" <= str(r.l_shipdate) < "1997-01-01"
            and 0.05 <= r.l_discount <= 0.07
            and r.l_quantity < 24
        ):
            n += 1
            kept += _r(r.l_extendedprice * r.l_discount * 100)
    row = revenue_change_forecast(spark, sf_dir).collect()[0]
    assert (row.n_lines, row.forecast_cents) == (n, kept) and n > 0


def test_revenue_forecast_predicates_reach_scan(spark, sf_dir):
    plan = revenue_change_forecast(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    # the band bounds and the quantity cap must all reach parquet
    assert "l_discount" in pushed and "l_quantity" in pushed


# ---- Q9 shape ---------------------------------------------------------------
def test_nation_profit_matches_brute(spark, sf_dir):
    parts = {
        r.p_partkey: r.p_retailprice
        for r in _rows(spark, sf_dir, "part")
        if PROFIT_PART_TOKEN in r.p_name
    }
    years = {
        r.o_orderkey: r.o_orderdate.year
        for r in _rows(spark, sf_dir, "orders")
    }
    nations = {
        r.n_nationkey: r.n_name for r in _rows(spark, sf_dir, "nation")
    }
    snation = {
        r.s_suppkey: nations[r.s_nationkey]
        for r in _rows(spark, sf_dir, "supplier")
    }
    agg: dict[tuple[str, int], list[int]] = defaultdict(lambda: [0, 0])
    for r in _rows(spark, sf_dir, "lineitem"):
        if r.l_partkey not in parts:
            continue
        profit = _r(
            r.l_extendedprice * (1 - r.l_discount) * 100
        ) - _r(parts[r.l_partkey] * r.l_quantity * PROFIT_COST_PCT)
        k = (snation[r.l_suppkey], years[r.l_orderkey])
        agg[k][0] += 1
        agg[k][1] += profit
    got = {
        (r.nation, r.order_year): (r.n_lines, r.profit_cents)
        for r in nation_year_profit(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()} and len(got) > 0


# ---- Q10 shape --------------------------------------------------------------
def test_returned_customers_matches_brute(spark, sf_dir):
    orders = {
        r.o_orderkey: r.o_custkey
        for r in _rows(spark, sf_dir, "orders")
        if "1996-01-01" <= str(r.o_orderdate) < "1996-04-01"
    }
    rev: dict[int, int] = defaultdict(int)
    for r in _rows(spark, sf_dir, "lineitem"):
        if r.l_returnflag == "R" and r.l_orderkey in orders:
            rev[orders[r.l_orderkey]] += _r(
                r.l_extendedprice * (1 - r.l_discount) * 100
            )
    want = sorted(rev.items(), key=lambda t: (-t[1], t[0]))[:20]
    got = [
        (r.c_custkey, r.returned_cents)
        for r in returned_item_customers(spark, sf_dir).collect()
    ]
    assert got == want and len(got) == 20


# ---- Q12 shape --------------------------------------------------------------
def test_late_priority_mix_matches_brute(spark, sf_dir):
    orders = {
        r.o_orderkey: (r.o_orderdate, r.o_orderpriority)
        for r in _rows(spark, sf_dir, "orders")
    }
    agg: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    for r in _rows(spark, sf_dir, "lineitem"):
        odate, oprio = orders[r.l_orderkey]
        if (r.l_shipdate.date() - odate.date()).days > LATE_SHIP_DAYS:
            hi = oprio in ("1-URGENT", "2-HIGH")
            agg[r.l_shipdate.year][0 if hi else 1] += 1
    got = {
        r.ship_year: (r.high_line_count, r.low_line_count)
        for r in late_priority_by_year(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()} and len(got) > 0


# ---- Q13 shape --------------------------------------------------------------
def test_order_distribution_keeps_zero_customers(spark, sf_dir):
    per_cust: dict[int, int] = {
        r.c_custkey: 0 for r in _rows(spark, sf_dir, "customer")
    }
    for r in _rows(spark, sf_dir, "orders"):
        if (
            r.o_orderpriority != DISTRIB_EXCLUDED_PRIORITY
            and r.o_custkey in per_cust
        ):
            per_cust[r.o_custkey] += 1
    dist: dict[int, int] = defaultdict(int)
    for v in per_cust.values():
        dist[v] += 1
    got = {
        r.c_count: r.custdist
        for r in customer_order_distribution(spark, sf_dir).collect()
    }
    assert got == dict(dist)
    # the shape's point: the filter lives in the JOIN condition, so
    # every customer appears in exactly one bucket (a WHERE-based
    # rewrite would drop customers whose orders are all excluded —
    # the fixture has none at this sf, so assert the conservation law
    # that such a rewrite breaks whenever they exist)
    assert sum(got.values()) == len(per_cust)


# ---- Q18 shape --------------------------------------------------------------
def test_large_quantity_matches_brute(spark, sf_dir):
    totals: dict[int, int] = defaultdict(int)
    for r in _rows(spark, sf_dir, "lineitem"):
        totals[r.l_orderkey] += int(r.l_quantity)
    orders = {
        r.o_orderkey: (r.o_custkey, r.o_orderdate)
        for r in _rows(spark, sf_dir, "orders")
    }
    names = {
        r.c_custkey: r.c_name for r in _rows(spark, sf_dir, "customer")
    }
    want = set()
    for ok, tq in totals.items():
        if tq > LARGE_ORDER_QTY:
            ck, od = orders[ok]
            want.add((ck, names[ck], ok, od, tq))
    got = {
        (r.c_custkey, r.c_name, r.o_orderkey, r.o_orderdate, r.total_qty)
        for r in orders_large_quantity(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_large_quantity_plans_semi_join(spark, sf_dir):
    plan = orders_large_quantity(spark, sf_dir)._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert "LeftSemi" in plan


# ---- Q20 shape --------------------------------------------------------------
def test_dominant_parts_matches_brute(spark, sf_dir):
    widget = {
        r.p_partkey
        for r in _rows(spark, sf_dir, "part")
        if PROFIT_PART_TOKEN in r.p_name
    }
    pq: dict[tuple[int, int], int] = defaultdict(int)
    for r in _rows(spark, sf_dir, "lineitem"):
        if "1996-01-01" <= str(r.l_shipdate) < "1997-01-01":
            pq[(r.l_partkey, r.l_suppkey)] += int(r.l_quantity)
    part_total: dict[int, int] = defaultdict(int)
    for (pk, _), q in pq.items():
        part_total[pk] += q
    counts: dict[int, int] = defaultdict(int)
    for (pk, sk), q in pq.items():
        if pk in widget and q * 2 > part_total[pk]:
            counts[sk] += 1
    got = {
        r.s_suppkey: r.n_dominant_parts
        for r in supplier_dominant_parts(spark, sf_dir).collect()
    }
    assert got == dict(counts) and len(got) > 0


def test_dominant_parts_plan_decorrelates(spark, sf_dir):
    plan = supplier_dominant_parts(spark, sf_dir)._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert "scalar-subquery" not in plan.lower()

"""Round-6 operators: TPC-H subquery shapes (Q2/Q4/Q11/Q15/Q16),
source-pair JS divergence, decomposition strength, and the greedy
k-center coreset — semantic cross-checks against brute-python
references plus the decorrelation plan contracts."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators.relational import (
    CHEAPEST_BRAND,
    IMPORTANT_PER_MILLE,
    LATE_SHIP_DAYS,
    VARIETY_MIN_BALANCE,
    orders_priority_exists,
    part_cheapest_supplier,
    part_revenue_important,
    part_supplier_variety,
    supplier_top_revenue,
)


def _lineitems(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").collect()


def _r(v: float) -> int:
    """Spark/DuckDB ROUND is HALF_UP; python round() is banker's —
    half-up here so the brute reference matches the engines."""
    return math.floor(v + 0.5)


# ---- Q2 shape ---------------------------------------------------------------
def test_cheapest_supplier_matches_brute(spark, sf_dir):
    li = _lineitems(spark, sf_dir)
    parts = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, sf_dir, "part").collect()
    }
    sup = {
        r.s_suppkey: r.s_name
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    best: dict[tuple[int, int], int] = {}
    for r in li:
        cents = _r(r.l_extendedprice * 100 / r.l_quantity)
        k = (r.l_partkey, r.l_suppkey)
        best[k] = min(best.get(k, cents), cents)
    per_part = defaultdict(list)
    for (pk, sk), cents in best.items():
        per_part[pk].append((cents, sk))
    want = set()
    for pk, rows in per_part.items():
        if parts[pk] != CHEAPEST_BRAND:
            continue
        m = min(c for c, _ in rows)
        for c, sk in rows:
            if c == m:
                want.add((pk, sup[sk], m))
    got = {
        (r.p_partkey, r.s_name, r.unit_cents)
        for r in part_cheapest_supplier(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_cheapest_supplier_plan_decorrelates(spark, sf_dir):
    plan = part_cheapest_supplier(spark, sf_dir)._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert "scalar-subquery" not in plan.lower()


# ---- Q4 shape ---------------------------------------------------------------
def test_priority_exists_matches_brute(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").collect()
    late_orders = {
        r.l_orderkey
        for r in load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.datediff("l_shipdate", "o_orderdate") > LATE_SHIP_DAYS
        )
        .select("l_orderkey")
        .collect()
    }
    want: dict[str, int] = defaultdict(int)
    for o in orders:
        if (
            str(o.o_orderdate) >= "1996-01-01"
            and str(o.o_orderdate) < "1997-01-01"
            and o.o_orderkey in late_orders
        ):
            want[o.o_orderpriority] += 1
    got = {
        r.o_orderpriority: r.n_late_orders
        for r in orders_priority_exists(spark, sf_dir).collect()
    }
    assert got == dict(want) and sum(got.values()) > 0


def test_priority_exists_plans_semi_join(spark, sf_dir):
    plan = orders_priority_exists(spark, sf_dir)._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert "LeftSemi" in plan


# ---- Q11 shape --------------------------------------------------------------
def test_revenue_important_threshold_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").collect()
    pmap = {
        r.p_partkey: (r.p_brand, r.p_type)
        for r in load_table(spark, sf_dir, "part").collect()
    }
    cents: dict[tuple[str, str], int] = defaultdict(int)
    for r in li:
        cents[pmap[r.l_partkey]] += _r(
            r.l_extendedprice * (1 - r.l_discount) * 100
        )
    total = sum(cents.values())
    want = {
        g for g, c in cents.items() if c * 1000 > total * IMPORTANT_PER_MILLE
    }
    rows = part_revenue_important(spark, sf_dir).collect()
    got = {(r.p_brand, r.p_type) for r in rows}
    assert got == want
    for r in rows:
        assert r.revenue_cents == cents[(r.p_brand, r.p_type)]


# ---- Q15 shape --------------------------------------------------------------
def test_top_revenue_supplier_is_the_max(spark, sf_dir):
    li = _lineitems(spark, sf_dir)
    rev: dict[int, int] = defaultdict(int)
    for r in li:
        d = str(r.l_shipdate)
        if "1996-01-01" <= d < "1996-04-01":
            rev[r.l_suppkey] += _r(
                r.l_extendedprice * (1 - r.l_discount) * 100
            )
    m = max(rev.values())
    want = {(sk, c) for sk, c in rev.items() if c == m}
    got = {
        (r.s_suppkey, r.total_cents)
        for r in supplier_top_revenue(spark, sf_dir).collect()
    }
    assert got == want and len(got) >= 1


# ---- Q16 shape --------------------------------------------------------------
def test_supplier_variety_excludes_complaints(spark, sf_dir):
    bad = {
        r.s_suppkey
        for r in load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < VARIETY_MIN_BALANCE)
        .collect()
    }
    pmap = {
        r.p_partkey: (r.p_brand, r.p_type)
        for r in load_table(spark, sf_dir, "part").collect()
    }
    variety: dict[tuple[str, str], set] = defaultdict(set)
    for r in _lineitems(spark, sf_dir):
        if r.l_suppkey not in bad:
            variety[pmap[r.l_partkey]].add(r.l_suppkey)
    got = {
        (r.p_brand, r.p_type): r.supplier_cnt
        for r in part_supplier_variety(spark, sf_dir).collect()
    }
    assert got == {g: len(s) for g, s in variety.items()}
    assert len(bad) > 0  # the exclusion actually bites


# ---- JS divergence ----------------------------------------------------------
def test_js_divergence_bounds_and_pair_grid(spark, sf_dir):
    from dbt_eamples_spark.operators.text import corpus_js_divergence

    rows = corpus_js_divergence(spark, sf_dir).collect()
    sources = {
        r.source
        for r in load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .collect()
    }
    s = len(sources)
    assert len(rows) == s * (s - 1) // 2
    for r in rows:
        assert r.sa < r.sb
        assert 0.0 <= r.js_nats <= math.log(2) + 1e-6
        assert r.n_terms > 0


def test_js_divergence_disjoint_vocab_reports_ln2(spark, tmp_path):
    """A source pair with ZERO shared vocabulary must still produce
    a row, with js_nats = round(ln 2, 6) — the pair grid is the
    left side of the fold join (ADVICE r6)."""
    from dbt_eamples_spark.operators.text import corpus_js_divergence

    rows = [
        (1, "alpha beta gamma alpha", "en", "src_a", 22),
        (2, "beta gamma delta", "en", "src_a", 16),
        (3, "omega psi chi omega psi", "en", "src_b", 23),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = corpus_js_divergence(spark, str(tmp_path)).collect()
    assert len(out) == 1  # the pair grid survives the empty fold
    r = out[0]
    assert (r.sa, r.sb) == ("src_a", "src_b")
    assert r.js_nats == round(math.log(2.0), 6)
    assert r.n_terms == 7  # 4 + 3 disjoint unigrams


def test_js_divergence_one_pair_matches_python(spark, sf_dir):
    from dbt_eamples_spark.operators.text import corpus_js_divergence

    docs = load_table(spark, sf_dir, "documents").collect()
    counts: dict[str, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for d in docs:
        for t in d.text.lower().split():
            counts[d.source][t] += 1
    row = corpus_js_divergence(spark, sf_dir).collect()[0]
    ca, cb = counts[row.sa], counts[row.sb]
    na, nb = sum(ca.values()), sum(cb.values())
    ln2 = round(math.log(2.0), 6)
    s_fp = 0
    n_both = 0
    for t in set(ca) & set(cb):
        n_both += 1
        canb, cbna = ca[t] * nb, cb[t] * na
        den = float(canb + cbna)
        s_fp += round(
            ca[t] / na * round(math.log(2.0 * canb / den), 6) * 1e9
        )
        s_fp += round(
            cb[t] / nb * round(math.log(2.0 * cbna / den), 6) * 1e9
        )
    sum_ca = sum(ca[t] for t in set(ca) & set(cb))
    sum_cb = sum(cb[t] for t in set(ca) & set(cb))
    s_fp += round((na - sum_ca) / na * ln2 * 1e9)
    s_fp += round((nb - sum_cb) / nb * ln2 * 1e9)
    assert row.n_terms == len(set(ca) | set(cb))
    assert abs(row.js_nats - round(s_fp / 2e9, 6)) < 1e-9


# ---- STL strength -----------------------------------------------------------
def test_stl_strength_in_unit_interval_and_matches_python(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import (
        ts_seasonal_decompose,
        ts_stl_strength,
    )

    stl = [
        r
        for r in ts_seasonal_decompose(spark, sf_dir).collect()
        if r.residual is not None
    ]
    by_type: dict[str, list] = defaultdict(list)
    for r in stl:
        by_type[r.event_type].append(r)
    got = {
        r.event_type: r for r in ts_stl_strength(spark, sf_dir).collect()
    }
    assert set(got) == set(by_type)
    for et, rows in by_type.items():
        n = len(rows)
        rr = [round(r.residual * 1e6) for r in rows]
        tr = [round((r.trend + r.residual) * 1e6) for r in rows]
        sr = [round((r.seasonal + r.residual) * 1e6) for r in rows]

        def vnum(xs):
            return n * sum(x * x for x in xs) - sum(xs) ** 2

        ft = round(max(0.0, 1.0 - vnum(rr) / vnum(tr)), 6)
        fs = round(max(0.0, 1.0 - vnum(rr) / vnum(sr)), 6)
        assert got[et].n_days == n
        assert abs(got[et].trend_strength - ft) < 1e-9
        assert abs(got[et].seasonal_strength - fs) < 1e-9
        assert 0.0 <= got[et].trend_strength <= 1.0
        assert 0.0 <= got[et].seasonal_strength <= 1.0


# ---- k-center coreset -------------------------------------------------------
def test_kcenter_matches_greedy_reference(spark, sf_dir):
    from dbt_eamples_spark.operators.similarity import (
        CORESET_K,
        sample_coreset_kcenter,
    )

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        num = 0.0
        for x, y in zip(a, b):
            num += x * y
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return num / (na * nb)

    seed = min(emb)
    centers = [(0, seed, None)]
    mind = {
        v: round(1.0 - cos(emb[v], emb[seed]), 6) for v in emb
    }
    for rnd in range(1, CORESET_K):
        nxt = max(mind, key=lambda v: (mind[v], -v))
        centers.append((rnd, nxt, mind[nxt]))
        for v in emb:
            mind[v] = min(
                mind[v], round(1.0 - cos(emb[v], emb[nxt]), 6)
            )
    got = [
        (r.sel_round, r.vec_id, r.coverage_radius)
        for r in sample_coreset_kcenter(spark, sf_dir).collect()
    ]
    assert got == centers
    radii = [c[2] for c in centers[1:]]
    assert radii == sorted(radii, reverse=True)  # max-min shrinks


# ---- Q7 shape ---------------------------------------------------------------
def test_trade_volume_matches_brute(spark, sf_dir):
    from dbt_eamples_spark.operators.relational import nations_trade_volume

    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    cnat = {
        r.c_custkey: nat[r.c_nationkey]
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    snat = {
        r.s_suppkey: nat[r.s_nationkey]
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    omap = {
        r.o_orderkey: (cnat[r.o_custkey], int(str(r.o_orderdate)[:4]))
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    want: dict[tuple, list[int]] = defaultdict(lambda: [0, 0])
    for r in _lineitems(spark, sf_dir):
        cust_nation, yr = omap[r.l_orderkey]
        supp_nation = snat[r.l_suppkey]
        if supp_nation == cust_nation:
            continue
        b = want[(supp_nation, cust_nation, yr)]
        b[0] += 1
        b[1] += _r(r.l_extendedprice * (1 - r.l_discount) * 100)
    got = {
        (r.supp_nation, r.cust_nation, r.order_year): (
            r.n_lines,
            r.revenue_cents,
        )
        for r in nations_trade_volume(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    assert len(got) > 0


# ---- Q14 shape --------------------------------------------------------------
def test_promo_share_single_pass_and_exact(spark, sf_dir):
    from dbt_eamples_spark.operators.relational import promo_revenue_share

    ptype = {
        r.p_partkey: r.p_type
        for r in load_table(spark, sf_dir, "part").collect()
    }
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for r in _lineitems(spark, sf_dir):
        m = str(r.l_shipdate)[:7]
        c = _r(r.l_extendedprice * (1 - r.l_discount) * 100)
        if ptype[r.l_partkey] == "PROMO":
            agg[m][0] += c
        agg[m][1] += c
    rows = promo_revenue_share(spark, sf_dir).collect()
    got = {r.ship_month: (r.promo_cents, r.total_cents) for r in rows}
    assert got == {m: tuple(v) for m, v in agg.items()}
    for r in rows:
        assert 0.0 <= r.promo_share <= 1.0
    # single corpus pass: exactly one lineitem scan in the plan
    plan = promo_revenue_share(spark, sf_dir)._jdf.queryExecution(
    ).optimizedPlan().toString()
    assert plan.lower().count("lineitem.parquet") <= 1


# ---- Q19 shape --------------------------------------------------------------
def test_disjunctive_scan_matches_brute(spark, sf_dir):
    from dbt_eamples_spark.operators.relational import (
        lineitem_disjunctive_scan,
    )

    pmeta = {
        r.p_partkey: (r.p_brand, r.p_size)
        for r in load_table(spark, sf_dir, "part").collect()
    }
    n = cents = 0
    for r in _lineitems(spark, sf_dir):
        brand, size = pmeta[r.l_partkey]
        q = r.l_quantity
        hit = (
            (brand == "Brand#12" and 1 <= q <= 11 and 1 <= size <= 5)
            or (brand == "Brand#23" and 10 <= q <= 20 and 1 <= size <= 10)
            or (brand == "Brand#4" and 20 <= q <= 30 and 1 <= size <= 15)
        )
        if hit:
            n += 1
            cents += _r(r.l_extendedprice * (1 - r.l_discount) * 100)
    row = lineitem_disjunctive_scan(spark, sf_dir).collect()[0]
    assert (row.n_lines, row.revenue_cents) == (n, cents)
    assert n > 0  # the disjunction actually selects something


def test_disjunctive_predicate_reaches_the_scan(spark, sf_dir):
    from dbt_eamples_spark.operators.relational import (
        lineitem_disjunctive_scan,
    )

    df = lineitem_disjunctive_scan(spark, sf_dir)
    df.collect()
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the folded-out common quantity bound pushes into the parquet scan
    assert "PushedFilters: [" in plan

"""Round-6 third wave: rolling-median anomaly baseline, degree
assortativity, embedding norm profile, and Neyman-allocation
stratified sampling — semantic cross-checks against brute-python
references (the oracle gate checks engine-exactness; these check
the DEFINITION)."""

from __future__ import annotations

import hashlib
import math
import statistics
from collections import defaultdict

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators.behavior import (
    ROLLMED_WINDOW_DAYS,
    ts_rolling_median,
)
from dbt_eamples_spark.operators.graph import graph_assortativity
from dbt_eamples_spark.operators.sampling import (
    NEYMAN_TOTAL_K,
    sample_neyman_allocation,
)
from dbt_eamples_spark.operators.similarity import (
    DIM_Q_SCALE,
    embedding_norm_stats,
)


def _r(v: float) -> int:
    """HALF_UP round, matching Spark/DuckDB ROUND (python round()
    is banker's)."""
    return math.floor(v + 0.5)


# ---- rolling median ---------------------------------------------------------
def test_rolling_median_matches_brute(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").collect()
    daily: dict[tuple[str, object], int] = defaultdict(int)
    for r in ev:
        daily[(r.event_type, r.ts.date())] += 1
    days = sorted({d for _, d in daily})
    d0, d1 = days[0], days[-1]
    cal = []
    d = d0
    while d <= d1:
        cal.append(d)
        d = d.fromordinal(d.toordinal() + 1)
    want = {}
    for et in sorted({t for t, _ in daily}):
        xs = [daily.get((et, d), 0) for d in cal]
        for i, d in enumerate(cal):
            frame = xs[max(0, i - (ROLLMED_WINDOW_DAYS - 1)) : i + 1]
            med = statistics.median(frame)
            want[(et, d.isoformat())] = (xs[i], float(med))
    got = ts_rolling_median(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        x, med = want[(r.event_type, r.day)]
        assert r.x == x
        assert r.med7 == med
        assert r.deviation == float(x) - med


# ---- assortativity ----------------------------------------------------------
def test_assortativity_matches_brute(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    edges = set()
    for parts in baskets.values():
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    deg: dict[int, int] = defaultdict(int)
    for a, _ in edges:
        deg[a] += 1
    ka = [deg[a] for a, b in edges]
    kb = [deg[b] for a, b in edges]
    n = len(edges)
    sx, sy = sum(ka), sum(kb)
    sxy = sum(a * b for a, b in zip(ka, kb))
    sxx = sum(a * a for a in ka)
    syy = sum(b * b for b in kb)
    den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    want = round((n * sxy - sx * sy) / den, 6)
    row = graph_assortativity(spark, sf_dir).collect()[0]
    assert row.n_edges == n
    assert row.n_nodes == len(deg)
    assert row.assortativity == want
    # both orientations stored -> moments symmetric -> r is the
    # undirected coefficient; sanity: swapping axes changes nothing
    assert sx == sy and sxx == syy


# ---- norm stats -------------------------------------------------------------
def test_norm_stats_matches_brute(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").collect()
    per_label = defaultdict(list)
    for r in emb:
        q2 = sum(
            _r(float(x) * DIM_Q_SCALE) ** 2 for x in r.embedding
        )
        per_label[r.label].append(_r(math.sqrt(q2)))
    got = {r.label: r for r in embedding_norm_stats(spark, sf_dir).collect()}
    assert set(got) == set(per_label)
    for lbl, qns in per_label.items():
        r = got[lbl]
        n = len(qns)
        s, ss = sum(qns), sum(q * q for q in qns)
        assert r.n_vecs == n
        assert r.mean_norm == round(s / n / DIM_Q_SCALE, 6)
        assert r.std_norm == round(
            math.sqrt((n * ss - s * s) / (n * n)) / DIM_Q_SCALE, 6
        )
        assert r.min_norm == round(min(qns) / DIM_Q_SCALE, 6)
        assert r.max_norm == round(max(qns) / DIM_Q_SCALE, 6)
        assert r.med_norm == round(
            statistics.median(qns) / DIM_Q_SCALE, 6
        )


# ---- Neyman allocation ------------------------------------------------------
def test_neyman_allocation_matches_brute(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    strata = defaultdict(list)
    for r in docs:
        strata[r.source].append((r.doc_id, r.n_chars))
    qw = {}
    for src, rows in strata.items():
        n = len(rows)
        s = sum(x for _, x in rows)
        ss = sum(x * x for _, x in rows)
        qw[src] = _r(math.sqrt(float(n * ss - s * s)) * 1e6)
    qtot = sum(qw.values())
    alloc = {
        src: max(1, _r(NEYMAN_TOTAL_K * w / qtot))
        for src, w in qw.items()
    }
    want = set()
    for src, rows in strata.items():
        ranked = sorted(
            rows,
            key=lambda t: (
                hashlib.md5(str(t[0]).encode()).hexdigest(),
                t[0],
            ),
        )
        want |= {(src, d) for d, _ in ranked[: alloc[src]]}
    got = sample_neyman_allocation(spark, sf_dir).collect()
    assert {(r.source, r.doc_id) for r in got} == want
    for r in got:
        assert r.alloc == alloc[r.source]
        assert 1 <= r.samp_rank <= r.alloc
    # the rounded quotas land near (not exactly on) the budget
    assert abs(len(got) - NEYMAN_TOTAL_K) <= len(strata)


def test_neyman_high_variance_stratum_earns_more(spark):
    """Definition check on a constructed corpus: same stratum sizes,
    10x the n_chars spread -> strictly larger quota."""
    import pyspark.sql.functions as F  # noqa: F401

    rows = []
    for i in range(60):
        rows.append((i, "t" * 10, "en", "flat", 1000 + (i % 3)))
    for i in range(60, 120):
        rows.append((i, "t" * 10, "en", "wild", 1000 + (i % 30) * 300))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        for t in ("documents",):
            df.write.mode("overwrite").parquet(f"{td}/{t}.parquet")
        out = sample_neyman_allocation(spark, td).collect()
    quota = {r.source: r.alloc for r in out}
    assert quota["wild"] > quota["flat"]


# ---- Hampel filter ----------------------------------------------------------
def test_hampel_matches_brute(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import (
        HAMPEL_K_X10000,
        HAMPEL_MAD_CONSISTENCY_X10000,
        ts_hampel_outliers,
    )

    ev = load_table(spark, sf_dir, "events").collect()
    daily: dict[tuple[str, object], int] = defaultdict(int)
    for r in ev:
        daily[(r.event_type, r.ts.date())] += 1
    days = sorted({d for _, d in daily})
    cal = []
    d = days[0]
    while d <= days[-1]:
        cal.append(d)
        d = d.fromordinal(d.toordinal() + 1)

    def med_int(vals):  # exact: even inputs -> integral midpoint
        s = sorted(vals)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) // 2

    want = {}
    for et in sorted({t for t, _ in daily}):
        xs = [daily.get((et, d), 0) for d in cal]
        for i, d in enumerate(cal):
            fr = [2 * v for v in xs[max(0, i - 6) : i + 1]]
            med2 = med_int(fr)
            mad4 = med_int([abs(v - med2) * 2 for v in fr])
            dev = abs(2 * xs[i] - med2)
            flag = (
                dev * 2 * 100_000_000
                > HAMPEL_K_X10000 * HAMPEL_MAD_CONSISTENCY_X10000 * mad4
            )
            want[(et, d.isoformat())] = (xs[i], med2 / 2.0, mad4 / 4.0, flag)
    got = ts_hampel_outliers(spark, sf_dir).collect()
    assert len(got) == len(want)
    for r in got:
        x, med7, mad, flag = want[(r.event_type, r.day)]
        assert (r.x, r.med7, r.mad, r.is_outlier) == (x, med7, mad, flag)
    assert any(r.is_outlier for r in got)  # the fixture has spikes


def test_hampel_ignores_spike_in_its_own_frame(spark):
    """Definition check: a lone 100x spike in an otherwise-flat
    series is flagged, and its flat neighbors are NOT (the rolling
    z-score would smear the spike across the whole frame)."""
    import datetime
    import tempfile

    from dbt_eamples_spark.operators.behavior import ts_hampel_outliers

    rows = []
    base = datetime.datetime(2024, 1, 1)
    eid = 0
    for day in range(21):
        n = 500 if day == 10 else 5 + (day % 2)
        for _ in range(n):
            rows.append(
                (eid, base + datetime.timedelta(days=day), 1, "tick", 1.0, None)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.mode("overwrite").parquet(f"{td}/events.parquet")
        out = {r.day: r.is_outlier for r in ts_hampel_outliers(spark, td).collect()}
    assert out["2024-01-11"] is True
    flagged = [d for d, f in out.items() if f]
    assert flagged == ["2024-01-11"]


# ---- basket lift ------------------------------------------------------------
def test_basket_lift_matches_brute(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import (
        LIFT_MIN_SUPPORT,
        LIFT_TOP_K,
        market_basket_lift,
    )

    li = load_table(spark, sf_dir, "lineitem").collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    n_orders = len(baskets)
    item = defaultdict(int)
    pair = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for p in ps:
            item[p] += 1
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair[(a, b)] += 1
    scored = []
    for (a, b), s in pair.items():
        if s < LIFT_MIN_SUPPORT:
            continue
        lift = round(s * n_orders / (item[a] * item[b]), 6)
        conf = round(s / item[a], 6)
        scored.append((-lift, a, b, s, item[a], item[b], lift, conf))
    scored.sort()
    want = [t[1:] for t in scored[:LIFT_TOP_K]]
    got = [
        (r.part_a, r.part_b, r.support, r.supp_a, r.supp_b, r.lift,
         r.confidence_a_to_b)
        for r in market_basket_lift(spark, sf_dir).collect()
    ]
    assert got == want
    assert all(r[5] is not None for r in got)

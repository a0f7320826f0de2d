"""Round-5 second-wave operators: triangle census, fixed-point EWMA
smoothing, Markov stationary distribution. Each gets (a) an exact
pure-python cross-check (the determinism contract enforced, not
asserted in prose) and (b) the structural invariants a user relies
on. The Spark-vs-DuckDB value hash runs in tools/oracle_check.py and
the driver gate; these tests pin the SEMANTICS."""

from __future__ import annotations

from collections import defaultdict

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_eamples_spark.operators.behavior import (
    EWMA_SCALE,
    MARKOV_ITERS,
    MARKOV_PSCALE,
    MARKOV_SCALE,
    events_markov_stationary,
    ts_ewma_smooth,
)
from dbt_eamples_spark.operators.graph import (
    triangles_compact_forward,
    graph_triangle_count,
)


# ---- triangles --------------------------------------------------------------
def _brute_triangles(und: set[tuple[int, int]]) -> set[tuple[int, int, int]]:
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    out = set()
    for u, v in und:
        for w in adj[u] & adj[v]:
            out.add(tuple(sorted((u, v, w))))
    return out


@st.composite
def undirected_graphs(draw):
    n = draw(st.integers(min_value=3, max_value=10))
    return draw(
        st.sets(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)).filter(
                lambda p: p[0] < p[1]
            ),
            min_size=2,
            max_size=24,
        )
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(undirected_graphs())
def test_compact_forward_enumerates_each_triangle_once(spark, und):
    edges = sorted({(a, b) for a, b in und} | {(b, a) for a, b in und})
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = [
        tuple(sorted((r.a, r.b, r.c)))
        for r in triangles_compact_forward(df).collect()
    ]
    # exactly once each: as a multiset, got equals the brute set
    assert sorted(got) == sorted(_brute_triangles(und))


def test_triangle_count_invariants(spark, sf_dir):
    rows = graph_triangle_count(spark, sf_dir).collect()
    assert rows, "co-purchase graph closes at least one triangle"
    for r in rows:
        assert r.deg >= 2 and r.n_triangles >= 1
        # a node closes at most C(deg, 2) triangles
        assert r.n_triangles <= r.deg * (r.deg - 1) // 2
        assert 0 < r.clustering_coeff <= 1.0
    tri = [r.n_triangles for r in rows]
    assert tri == sorted(tri, reverse=True)


# ---- EWMA -------------------------------------------------------------------
def _ewma_reference(sf_dir: str) -> dict[tuple[str, str], tuple[int, int]]:
    con = duckdb.connect()
    daily = con.execute(
        "SELECT event_type, strftime(CAST(date_trunc('day', ts) AS DATE),"
        " '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    out, state = {}, {}
    for et, day, n in daily:
        s = state.get(et)
        s = n * EWMA_SCALE if s is None else (n * EWMA_SCALE + 3 * s) // 4
        state[et] = s
        out[(et, day)] = (n, s)
    return out


def test_ewma_matches_pure_python_bit_for_bit(spark, sf_dir):
    got = {
        (r.event_type, r.day): (r.n_events, r.ewma_fp)
        for r in ts_ewma_smooth(spark, sf_dir).collect()
    }
    assert got == _ewma_reference(sf_dir)


def test_ewma_is_a_convex_combination(spark, sf_dir):
    rows = ts_ewma_smooth(spark, sf_dir).collect()
    by_type = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        by_type[r.event_type].append(r)
    for series in by_type.values():
        lo = hi = series[0].n_events * EWMA_SCALE
        assert series[0].ewma_fp == lo
        for r in series[1:]:
            lo = min(lo, r.n_events * EWMA_SCALE)
            hi = max(hi, r.n_events * EWMA_SCALE)
            # convexity (up to the per-step floor): never escapes
            # the running min/max envelope of the inputs
            assert lo - 1 <= r.ewma_fp <= hi


# ---- Markov stationary ------------------------------------------------------
def _markov_reference(sf_dir: str) -> dict[str, tuple[int, int]]:
    con = duckdb.connect()
    pairs = con.execute(
        "SELECT prev, event_type FROM (SELECT lag(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS prev, event_type "
        f"FROM read_parquet('{sf_dir}/events.parquet')) WHERE prev IS NOT NULL"
    ).fetchall()
    c = defaultdict(int)
    c_out = defaultdict(int)
    for p, n in pairs:
        c[(p, n)] += 1
        c_out[p] += 1
    p_fp = {k: (v * MARKOV_PSCALE) // c_out[k[0]] for k, v in c.items()}
    nodes = sorted(c_out)
    pi = {t: MARKOV_SCALE // len(nodes) for t in nodes}
    for _ in range(MARKOV_ITERS):
        nxt = defaultdict(int)
        for (p, n), fp in p_fp.items():
            nxt[n] += (pi.get(p, 0) * fp) // MARKOV_PSCALE
        pi = {t: v for t, v in nxt.items() if t in c_out}
    return {t: (c_out[t], pi.get(t, 0)) for t in nodes if t in pi}


def test_markov_matches_pure_python_bit_for_bit(spark, sf_dir):
    got = {
        r.event_type: (r.n_out, r.pi_fp)
        for r in events_markov_stationary(spark, sf_dir).collect()
    }
    assert got == _markov_reference(sf_dir)


def test_markov_mass_is_conserved_up_to_flooring(spark, sf_dir):
    rows = events_markov_stationary(spark, sf_dir).collect()
    total = sum(r.pi_fp for r in rows)
    assert 0 < total <= MARKOV_SCALE
    # each step floors away < PSCALE per (edge) + < 1 per target:
    # a generous slack is one millionth per iteration
    assert total >= MARKOV_SCALE - MARKOV_ITERS * (
        MARKOV_SCALE // 10**6 + len(rows) * MARKOV_PSCALE
    )
    vals = [r.pi_fp for r in rows]
    assert vals == sorted(vals, reverse=True)


# ---- CUSUM ------------------------------------------------------------------
def _cusum_reference(sf_dir: str):
    from dbt_eamples_spark.operators.behavior import (
        CUSUM_H_PCT,
        CUSUM_SLACK_PCT,
    )

    con = duckdb.connect()
    daily = con.execute(
        "SELECT event_type, strftime(CAST(date_trunc('day', ts) AS DATE),"
        " '%Y-%m-%d'), CAST(count(*) AS BIGINT) FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    tot = defaultdict(int)
    n_days = defaultdict(int)
    for et, _d, n in daily:
        tot[et] += n
        n_days[et] += 1
    out, sp, sn = {}, defaultdict(int), defaultdict(int)
    for et, day, n in daily:
        x = 100 * n_days[et] * n
        sp[et] = max(0, sp[et] + x - (100 + CUSUM_SLACK_PCT) * tot[et])
        sn[et] = max(0, sn[et] + (100 - CUSUM_SLACK_PCT) * tot[et] - x)
        out[(et, day)] = (
            n,
            sp[et],
            sn[et],
            sp[et] > CUSUM_H_PCT * tot[et],
            sn[et] > CUSUM_H_PCT * tot[et],
        )
    return out


def test_cusum_matches_pure_python_bit_for_bit(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import (
        events_changepoint_cusum,
    )

    got = {
        (r.event_type, r.day): (
            r.n_events,
            r.cusum_up_fp,
            r.cusum_down_fp,
            r.shift_up,
            r.shift_down,
        )
        for r in events_changepoint_cusum(spark, sf_dir).collect()
    }
    assert got == _cusum_reference(sf_dir)


def test_cusum_sides_never_both_flag(spark, sf_dir):
    """h = 4*mean and k = mean/2 make simultaneous up+down shifts
    impossible on any series (one side resets while the other
    accumulates); states are always non-negative."""
    from dbt_eamples_spark.operators.behavior import (
        events_changepoint_cusum,
    )

    for r in events_changepoint_cusum(spark, sf_dir).collect():
        assert r.cusum_up_fp >= 0 and r.cusum_down_fp >= 0
        assert not (r.shift_up and r.shift_down)


# ---- seasonal decomposition -------------------------------------------------
def test_decompose_additive_identity(spark, sf_dir):
    """trend + seasonal + residual == n_events EXACTLY in rationals
    (s7/7 + n_t/7 telescopes); the rounded doubles must reconstruct
    the count within stacked rounding error."""
    from dbt_eamples_spark.operators.behavior import ts_seasonal_decompose

    rows = ts_seasonal_decompose(spark, sf_dir).collect()
    full = [r for r in rows if r.trend is not None]
    assert full, "fixture series long enough for a centered window"
    for r in full:
        assert r.residual is not None and r.seasonal is not None
        recon = r.trend + r.seasonal + r.residual
        assert abs(recon - r.n_events) < 3e-6, r


def test_decompose_seasonal_constant_per_dow(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import ts_seasonal_decompose

    rows = ts_seasonal_decompose(spark, sf_dir).collect()
    seen = {}
    for r in rows:
        if r.seasonal is None:
            continue
        key = (r.event_type, r.dow)
        assert seen.setdefault(key, r.seasonal) == r.seasonal
    # weekly indexes exist for every observed dow of every type
    assert len({k[1] for k in seen}) <= 7


def test_decompose_edges_are_null_not_shortened(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import ts_seasonal_decompose

    rows = sorted(
        ts_seasonal_decompose(spark, sf_dir).collect(),
        key=lambda r: (r.event_type, r.day),
    )
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for series in by_type.values():
        # first/last 3 days cannot have a full centered window
        for r in series[:3] + series[-3:]:
            assert r.trend is None and r.residual is None


# ---- streaming twins --------------------------------------------------------
class TestStreamingTwins:
    def test_ewma_streaming_equals_batch(self, spark, sf_dir, tmp_path):
        import uuid

        from dbt_eamples_spark.operators.behavior import ts_ewma_smooth
        from dbt_eamples_spark.streaming.streams import (
            ts_ewma_smooth_streaming,
        )

        name = f"ewma_{uuid.uuid4().hex[:8]}"
        ts_ewma_smooth_streaming(
            spark, sf_dir, checkpoint=str(tmp_path / "ck_e"), out_table=name
        )
        streamed = spark.sql(f"SELECT * FROM {name}")
        batch = ts_ewma_smooth(spark, sf_dir)
        diff = (
            streamed.exceptAll(batch).count()
            + batch.exceptAll(streamed).count()
        )
        assert diff == 0 and batch.count() > 0

    def test_cusum_streaming_equals_batch(self, spark, sf_dir, tmp_path):
        import uuid

        from dbt_eamples_spark.operators.behavior import (
            events_changepoint_cusum,
        )
        from dbt_eamples_spark.streaming.streams import (
            events_changepoint_cusum_streaming,
        )

        name = f"cusum_{uuid.uuid4().hex[:8]}"
        events_changepoint_cusum_streaming(
            spark, sf_dir, checkpoint=str(tmp_path / "ck_c"), out_table=name
        )
        streamed = spark.sql(f"SELECT * FROM {name}")
        batch = events_changepoint_cusum(spark, sf_dir)
        diff = (
            streamed.exceptAll(batch).count()
            + batch.exceptAll(streamed).count()
        )
        assert diff == 0 and batch.count() > 0


# ---- Kaplan-Meier -----------------------------------------------------------
def _km_reference(sf_dir: str):
    from dbt_eamples_spark.operators.behavior import (
        KM_CENSOR_GAP_DAYS,
        KM_SCALE,
    )

    con = duckdb.connect()
    spans = con.execute(
        "SELECT CAST(max(ts) AS DATE) - CAST(min(ts) AS DATE) AS t, "
        "CAST(max(ts) AS DATE) AS last_day FROM "
        f"read_parquet('{sf_dir}/events.parquet') GROUP BY user_id"
    ).fetchall()
    obs_end = max(r[1] for r in spans)
    tab = defaultdict(lambda: [0, 0])
    for t, last in spans:
        censored = (obs_end - last).days < KM_CENSOR_GAP_DAYS
        tab[t][1 if censored else 0] += 1
    n = len(spans)
    s, out = KM_SCALE, []
    for t in sorted(tab):
        d, c = tab[t]
        s = s * (n - d) // n
        out.append((t, n, d, c, s))
        n -= d + c
    return out


def test_km_matches_pure_python_bit_for_bit(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import events_survival_km

    got = sorted(
        (r.t_days, r.n_at_risk, r.n_churned, r.n_censored, r.survival_fp)
        for r in events_survival_km(spark, sf_dir).collect()
    )
    assert got == _km_reference(sf_dir)


def test_km_curve_invariants(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import KM_SCALE
    from dbt_eamples_spark.operators.behavior import events_survival_km

    rows = sorted(
        events_survival_km(spark, sf_dir).collect(),
        key=lambda r: r.t_days,
    )
    assert rows
    prev_s, prev_n = KM_SCALE, None
    for r in rows:
        # survival is a non-increasing probability
        assert 0 <= r.survival_fp <= prev_s
        prev_s = r.survival_fp
        # the risk set shrinks by exactly the exits of the prior step
        if prev_n is not None:
            assert r.n_at_risk == prev_n
        prev_n = r.n_at_risk - r.n_churned - r.n_censored
        # censored users never decrease survival on their own
        if r.n_churned == 0:
            assert r.survival_fp == (rows[rows.index(r) - 1].survival_fp
                                     if rows.index(r) else KM_SCALE)


# ---- MMR --------------------------------------------------------------------
def _mmr_reference(sf_dir: str):
    """Pure-python MMR with the SAME sequential-fold cosine and
    round(6) the engines use."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from dbt_eamples_spark.operators.similarity import (
        MMR_K,
        MMR_SHORTLIST,
        N_QUERIES,
    )

    def round6(x):
        """Engine round: HALF_UP on the double's shortest decimal
        repr (Spark/DuckDB semantics; python's round() banker's-
        rounds the binary value — off by 1ulp at tie digits)."""
        return float(
            Decimal(repr(x)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    con = duckdb.connect()
    vecs = {
        vid: [float(x) for x in v]
        for vid, v in con.execute(
            "SELECT vec_id, embedding FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchall()
    }

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot = dot + x * y
        na = nb = 0.0
        for x in a:
            na = na + x * x
        for y in b:
            nb = nb + y * y
        return round6(dot / (math.sqrt(na) * math.sqrt(nb)))

    out = []
    for qid in range(N_QUERIES):
        rel = {
            vid: cos(vecs[qid], v)
            for vid, v in vecs.items()
            if vid != qid
        }
        short = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_SHORTLIST]
        sel = [short[0]]
        out.append((qid, 1, short[0], rel[short[0]], None, None))
        for rank in range(2, MMR_K + 1):
            best = None
            for c in short:
                if c in sel:
                    continue
                ms = max(cos(vecs[c], vecs[s]) for s in sel)
                score = 0.5 * rel[c] - 0.5 * ms
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, ms, score)
            _, c, ms, score = best
            sel.append(c)
            out.append((qid, rank, c, rel[c], ms, round6(score)))
    return sorted(out)


def test_mmr_matches_pure_python(spark, sf_dir):
    from dbt_eamples_spark.operators.similarity import similarity_mmr_topk

    got = sorted(
        (
            r.query_id,
            r.rank,
            r.neighbor_id,
            r.rel,
            r.max_sim_selected,
            r.mmr_score,
        )
        for r in similarity_mmr_topk(spark, sf_dir).collect()
    )
    assert got == _mmr_reference(sf_dir)


def test_mmr_first_pick_is_pure_relevance(spark, sf_dir):
    from dbt_eamples_spark.operators.similarity import (
        MMR_K,
        similarity_mmr_topk,
        similarity_topk,
    )

    mmr = similarity_mmr_topk(spark, sf_dir).collect()
    top = {
        r.query_id: r.neighbor_id
        for r in similarity_topk(spark, sf_dir).collect()
        if r.rk == 1
    }
    by_q = defaultdict(set)
    for r in mmr:
        by_q[r.query_id].add(r.neighbor_id)
        if r.rank == 1:
            assert r.neighbor_id == top[r.query_id]
            assert r.mmr_score is None and r.max_sim_selected is None
    for q, picks in by_q.items():
        assert len(picks) == MMR_K  # K distinct selections

"""Round-7 operator cross-checks: Theil index, n-gram novelty,
Matryoshka eval, and the dedup cascade funnel against pure-python
references / internal invariants on the sf0.001 fixture."""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table


def test_theil_matches_python(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import agg_theil_index

    li = load_table(spark, sf_dir, "lineitem").collect()
    rev: dict[int, int] = defaultdict(int)
    for r in li:
        # HALF_UP like Spark/DuckDB round() — python round() is
        # banker's and disagrees on exact .5 cents
        rev[r.l_partkey] += math.floor(
            r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5
        )
    n, sx = len(rev), sum(rev.values())
    s_fp = 0
    for x in rev.values():
        ratio = (x * n) / sx
        s_fp += round(ratio * round(math.log(ratio), 6) * 1e9)
    want = round(s_fp / 1e9 / n, 6)
    row = agg_theil_index(spark, sf_dir).collect()[0]
    assert row.n_parts == n
    assert row.total_cents == sx
    assert abs(row.theil - want) < 1e-9
    assert row.theil >= 0  # Theil T is non-negative


def test_ngram_novelty_matches_python(spark, sf_dir):
    from dbt_eamples_spark.operators.text import text_ngram_novelty

    docs = load_table(spark, sf_dir, "documents").collect()
    first: dict[str, int] = {}
    per_doc: dict[int, list[str]] = {}
    for d in sorted(docs, key=lambda r: r.doc_id):
        toks = d.text.lower().split()
        n = max(len(toks) - 2, 1)
        grams = list({" ".join(toks[i : i + 3]) for i in range(n)})
        per_doc[d.doc_id] = grams
        for g in grams:
            if g not in first or d.doc_id < first[g]:
                first[g] = d.doc_id
    got = {r.doc_id: r for r in text_ngram_novelty(spark, sf_dir).collect()}
    assert set(got) == set(per_doc)
    for doc_id, grams in per_doc.items():
        novel = sum(1 for g in grams if first[g] == doc_id)
        r = got[doc_id]
        assert r.n_grams == len(grams)
        assert r.n_novel == novel
        assert r.novelty == round(novel / len(grams), 6)
    # doc 0 cohort: the earliest doc's grams are all novel
    min_doc = min(per_doc)
    assert got[min_doc].novelty == 1.0


def test_matryoshka_overlap_matches_brute(spark, sf_dir):
    from dbt_eamples_spark.operators.similarity import (
        MATRYOSHKA_DIMS,
        N_QUERIES,
        TOP_K,
        embedding_matryoshka_eval,
    )

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def topk(d):
        out = {}
        for q in range(N_QUERIES):
            qv = vecs[q][:d] if d else vecs[q]
            scored = []
            for vid, v in vecs.items():
                if vid == q:
                    continue
                vv = v[:d] if d else v
                dot = 0.0
                for x, y in zip(qv, vv):
                    dot += x * y
                na = math.sqrt(sum(x * x for x in qv))
                nb = math.sqrt(sum(x * x for x in vv))
                scored.append((round(dot / (na * nb), 6), vid))
            scored.sort(key=lambda t: (-t[0], t[1]))
            out[q] = {vid for _, vid in scored[:TOP_K]}
        return out

    full = topk(None)
    got = {
        (r.dims, r.query_id): r
        for r in embedding_matryoshka_eval(spark, sf_dir).collect()
    }
    assert len(got) == len(MATRYOSHKA_DIMS) * N_QUERIES
    for d in MATRYOSHKA_DIMS:
        trunc = topk(d)
        for q in range(N_QUERIES):
            want = len(trunc[q] & full[q])
            r = got[(d, q)]
            assert r.n_overlap == want, (d, q, r.n_overlap, want)
            assert r.overlap == round(want / TOP_K, 6)


def test_cascade_funnel_invariants(spark, sf_dir):
    from dbt_eamples_spark.operators.dedup import (
        dedup_cascade_attrition,
        dedup_clusters,
        dedup_exact,
    )

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = {r.stage: r for r in dedup_cascade_attrition(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    assert [rows[s].stage_name for s in (1, 2, 3)] == [
        "exact",
        "near_dup",
        "span_heavy",
    ]
    # stage 1 removal = exact-dup copies beyond the keeper
    exact_removed = sum(
        r.n_copies - 1 for r in dedup_exact(spark, sf_dir).collect()
    )
    assert rows[1].n_removed == exact_removed
    # stage 2 removal <= cluster non-canonicals (precedence: some
    # were already exact dups)
    non_canon = dedup_clusters(spark, sf_dir).filter(~F.col("keep")).count()
    assert rows[2].n_removed <= non_canon
    # funnel conservation + monotone survivors
    cum = 0
    prev_surv = n_docs
    for s in (1, 2, 3):
        cum += rows[s].n_removed
        assert rows[s].n_surviving == n_docs - cum
        assert rows[s].n_surviving <= prev_surv
        prev_surv = rows[s].n_surviving
        assert rows[s].cum_removed_frac == round(cum / n_docs, 6)


def test_winsorized_mean_matches_python(spark, sf_dir):
    from dbt_eamples_spark.operators.quality import agg_winsorized_mean

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    ).collect()
    by_type: dict[str, list[float]] = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append(r.value)

    def q(vals, p):  # quantile_cont interpolation
        vals = sorted(vals)
        pos = p * (len(vals) - 1)
        lo, frac = int(pos), pos - int(pos)
        return (
            vals[lo] + (vals[lo + 1] - vals[lo]) * frac
            if frac
            else vals[lo]
        )

    got = {r.event_type: r for r in agg_winsorized_mean(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        lo, hi = q(vals, 0.05), q(vals, 0.95)
        clipped = [min(max(v, lo), hi) for v in vals]
        n = len(vals)
        r = got[t]
        assert r.n == n
        assert r.n_clipped == sum(1 for v in vals if v < lo or v > hi)
        want_w = round(
            sum(math.floor(abs(c) * 1e4 + 0.5) * (1 if c >= 0 else -1)
                for c in clipped) / 1e4 / n, 6
        )
        assert abs(r.winsor_mean - want_w) < 2e-6
        assert r.n_clipped <= max(2, int(0.12 * n))  # ~10% by design


def test_seasonal_anomaly_subsets_residuals(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import (
        SEASONAL_ANOM_K,
        ts_seasonal_anomaly,
        ts_seasonal_decompose,
    )

    stl = [
        r
        for r in ts_seasonal_decompose(spark, sf_dir).collect()
        if r.residual is not None
    ]
    by_type: dict[str, list[float]] = defaultdict(list)
    for r in stl:
        by_type[r.event_type].append(r.residual)

    def med(vals):
        vals = sorted(vals)
        n = len(vals)
        return (
            vals[n // 2]
            if n % 2
            else (vals[n // 2 - 1] + vals[n // 2]) / 2
        )

    flags = ts_seasonal_anomaly(spark, sf_dir).collect()
    keyed = {(r.event_type, r.day) for r in flags}
    # every flagged row is a true > K*MAD residual by the python ref
    for t, vals in by_type.items():
        m = med(vals)
        mad = med([abs(v - m) for v in vals])
        for r in stl:
            if r.event_type != t:
                continue
            is_anom = abs(r.residual - m) > SEASONAL_ANOM_K * mad
            assert ((t, r.day) in keyed) == is_anom, (t, r.day)


def test_weighted_reservoir_is_weighted_and_exact_k(spark, sf_dir):
    from dbt_eamples_spark.operators.sampling import (
        RESERVOIR_K,
        sample_weighted_reservoir,
    )
    from dbt_eamples_spark.operators.text import text_quality_score

    rows = sample_weighted_reservoir(spark, sf_dir).collect()
    assert len(rows) == RESERVOIR_K
    assert len({r.doc_id for r in rows}) == RESERVOIR_K  # no replacement
    # inclusion prob ∝ weight: the sampled mean quality must exceed
    # the corpus mean (deterministic on this fixture)
    all_q = [
        r.quality_score
        for r in text_quality_score(spark, sf_dir).collect()
    ]
    samp_q = [r.quality_score for r in rows]
    assert sum(samp_q) / len(samp_q) > sum(all_q) / len(all_q)
    # keys are sorted ascending in the output's own ordering
    keys = [r.es_key for r in rows]
    assert keys == sorted(keys)


def test_user_entropy_matches_python(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import events_user_entropy

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).collect()
    cnt: dict[int, dict[str, int]] = defaultdict(lambda: defaultdict(int))
    for r in ev:
        cnt[r.user_id][r.event_type] += 1
    got = {r.user_id: r for r in events_user_entropy(spark, sf_dir).collect()}
    assert set(got) == set(cnt)
    for uid, types in cnt.items():
        n = sum(types.values())
        s_fp = 0
        for c in types.values():
            p = c / n
            s_fp += round(-p * round(math.log(p), 6) * 1e9)
        r = got[uid]
        assert r.n_events == n
        assert r.n_types == len(types)
        assert r.entropy_nats == round(s_fp / 1e9, 6)
        assert 0 <= r.entropy_nats <= math.log(max(len(types), 1)) + 1e-6


def test_incremental_cosine_probes_persisted_index(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The index artifact builds once; a second probe run reuses it
    (the dedup_incremental_minhash artifact contract, ANN side) —
    and every reported pair is delta×corpus with cosine over
    threshold."""
    import dbt_eamples_spark.artifacts as A
    from dbt_eamples_spark.operators.dedup import (
        COSINE_NEAR_DUP,
        INCR_MOD,
        dedup_incremental_cosine,
    )

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path))
    n0 = len(A.ARTIFACT_EVENTS)
    first = dedup_incremental_cosine(spark, sf_dir).collect()
    second = dedup_incremental_cosine(spark, sf_dir).collect()
    ev = [e for e in A.ARTIFACT_EVENTS[n0:] if e[0] == "cosine_base_index"]
    assert ev == [("cosine_base_index", "build"),
                  ("cosine_base_index", "reuse")]
    assert {(r.new_vec, r.corpus_vec) for r in first} == {
        (r.new_vec, r.corpus_vec) for r in second
    }
    assert len(first) > 0
    for r in first:
        assert r.new_vec % INCR_MOD == 0
        assert r.corpus_vec % INCR_MOD != 0
        assert r.cosine >= COSINE_NEAR_DUP


def test_ljung_box_matches_python(spark, sf_dir):
    from dbt_eamples_spark.operators.behavior import (
        ts_autocorrelation,
        ts_ljung_box,
    )

    acf = ts_autocorrelation(spark, sf_dir).collect()
    by_type: dict[str, list] = defaultdict(list)
    for r in acf:
        if r.acf is not None:  # NULL-r_k lags excluded (ADVICE r7)
            by_type[r.event_type].append(r)
    # n = the OBSERVED per-type series length from the daily grid,
    # independent of the correlogram (the round-8 n_days contract)
    ev = load_table(spark, sf_dir, "events").collect()
    days: dict[str, set] = defaultdict(set)
    for e in ev:
        days[e.event_type].add(e.ts.date())
    got = {r.event_type: r for r in ts_ljung_box(spark, sf_dir).collect()}
    assert set(got) == set(by_type)
    for t, rows in by_type.items():
        n = len(days[t])
        s_fp = sum(
            round(r.acf * r.acf / r.n_pairs * 1e12) for r in rows
        )
        r = got[t]
        assert r.n_days == n
        assert r.h_lags == len(rows)
        assert r.q_stat == round(n * (n + 2) * (s_fp / 1e12), 6)
        assert r.q_stat >= 0


def test_source_jaccard_matches_python(spark, sf_dir):
    from dbt_eamples_spark.operators.text import (
        text_jaccard_source_similarity,
    )

    docs = load_table(spark, sf_dir, "documents").collect()
    grams: dict[str, set] = defaultdict(set)
    for d in docs:
        toks = d.text.lower().split()
        n = max(len(toks) - 2, 1)
        grams[d.source] |= {" ".join(toks[i : i + 3]) for i in range(n)}
    srcs = sorted(grams)
    got = {
        (r.sa, r.sb): r
        for r in text_jaccard_source_similarity(spark, sf_dir).collect()
    }
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2  # full grid
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(grams[a] & grams[b])
            union = len(grams[a] | grams[b])
            r = got[(a, b)]
            assert r.na == len(grams[a]) and r.nb == len(grams[b])
            assert r.n_both == inter
            assert r.jaccard == round(inter / union, 6)


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    from dbt_eamples_spark.operators.asof import (
        ASOF_TOLERANCE_DAYS,
        join_asof,
        join_asof_tolerance,
    )

    base = {r.event_id: r for r in join_asof(spark, sf_dir).collect()}
    tol = {
        r.event_id: r
        for r in join_asof_tolerance(spark, sf_dir).collect()
    }
    assert set(base) == set(tol)
    horizon = ASOF_TOLERANCE_DAYS * 86400
    n_stale = 0
    for eid, b in base.items():
        t = tol[eid]
        if b.last_purchase_ts is None:
            assert t.last_purchase_id is None and not t.stale_dropped
        elif (b.ts - b.last_purchase_ts).total_seconds() <= horizon:
            assert t.last_purchase_id == b.last_purchase_id
            assert not t.stale_dropped
        else:
            assert t.last_purchase_id is None
            assert t.last_purchase_ts is None
            assert t.stale_dropped
            n_stale += 1
    assert n_stale > 0  # the bound actually bites on the fixture


def test_transitivity_matches_python(spark, sf_dir):
    from dbt_eamples_spark.operators.graph import (
        _copurchase_edges,
        graph_transitivity,
    )

    E = {
        (r.src, r.dst)
        for r in _copurchase_edges(spark, sf_dir).collect()
    }
    adj: dict[int, set] = defaultdict(set)
    for s, d in E:
        adj[s].add(d)
    tri = 0
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            tri += sum(1 for c in adj[a] & adj[b] if c > b)
    wedges2 = sum(len(v) * (len(v) - 1) for v in adj.values())
    cc_nodes = [n for n in adj if len(adj[n]) >= 2]
    per_t: dict[int, int] = defaultdict(int)
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for x in (a, b, c):
                        per_t[x] += 1
    s_cc = sum(
        round(2.0 * per_t.get(n, 0) / (len(adj[n]) * (len(adj[n]) - 1)) * 1e6)
        for n in cc_nodes
    )
    r = graph_transitivity(spark, sf_dir).collect()[0]
    assert r.n_nodes == len(adj)
    assert r.n_und_edges == len(E) // 2
    assert r.n_wedges == wedges2 // 2
    assert r.n_triangles == tri
    assert r.transitivity == round(6.0 * tri / wedges2, 6)
    assert r.avg_local_cc == round(s_cc / 1e6 / len(cc_nodes), 6)


def test_ab_test_matches_python(spark, sf_dir):
    import hashlib

    from dbt_eamples_spark.operators.behavior import (
        AB_CONVERT_MIN,
        events_ab_test,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).collect()
    pc: dict[int, int] = defaultdict(int)
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            pc[r.user_id] += 1

    def coin(uid):
        h = hashlib.md5(str(uid).encode()).hexdigest()[:15]
        return int(h, 16) / float(1 << 60)

    n = {"A": 0, "B": 0}
    c = {"A": 0, "B": 0}
    for uid in users:
        arm = "A" if coin(uid) < 0.5 else "B"
        n[arm] += 1
        c[arm] += int(pc.get(uid, 0) >= AB_CONVERT_MIN)
    r = events_ab_test(spark, sf_dir).collect()[0]
    assert (r.n_a, r.n_b, r.c_a, r.c_b) == (n["A"], n["B"], c["A"], c["B"])
    assert r.rate_a == round(c["A"] / n["A"], 6)
    assert r.rate_b == round(c["B"] / n["B"], 6)
    pool = (c["A"] + c["B"]) / (n["A"] + n["B"])
    assert 0 < pool < 1  # the threshold genuinely splits the corpus
    se = math.sqrt(pool * (1 - pool) * (1 / n["A"] + 1 / n["B"]))
    want_z = round((c["B"] / n["B"] - c["A"] / n["A"]) / se, 6)
    assert r.z_score == want_z

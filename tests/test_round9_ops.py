"""Round-9 operators: recall-eval extensions (VERDICT r8 #4) and the
delta/incremental paths' query-facing twins."""

from __future__ import annotations

import pytest


@pytest.mark.parametrize("kind", ["lsh", "ivfpq"])
def test_recall_eval_matches_python(spark, sf_dir, kind):
    """recall@k recomputed in python from the two operators' own
    outputs (the round-8 ivf-recall lock, applied to the LSH and
    residual-IVF-PQ shortlists)."""
    from dbt_eamples_spark.operators.similarity import (
        TOP_K,
        similarity_ivf_pq_residual_topk,
        similarity_ivfpq_recall_eval,
        similarity_lsh_recall_eval,
        similarity_lsh_topk,
        similarity_topk,
    )

    approx_fn, eval_fn = {
        "lsh": (similarity_lsh_topk, similarity_lsh_recall_eval),
        "ivfpq": (
            similarity_ivf_pq_residual_topk,
            similarity_ivfpq_recall_eval,
        ),
    }[kind]
    exact: dict[int, set[int]] = {}
    for r in similarity_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set[int]] = {}
    for r in approx_fn(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    rows = eval_fn(spark, sf_dir).collect()
    assert sorted(r.query_id for r in rows) == sorted(exact)
    for r in rows:
        want = len(exact[r.query_id] & approx.get(r.query_id, set()))
        assert r.k == TOP_K and r.n_overlap == want
        assert abs(r.recall - round(want / TOP_K, 6)) < 1e-12
        assert 0 <= r.recall <= 1

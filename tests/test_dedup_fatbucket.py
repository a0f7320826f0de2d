"""Degenerate-bucket behavior of the MinHash/SimHash candidate stage.

A 100 TB corpus always contains a pathological band bucket
(boilerplate pages, empty docs): every member hashes to the same
band key. Round-2 expanded pairs with an in-bucket ``collect_list``,
so one aggregation buffer had to hold the whole bucket; the
candidate stage is now a hash self-join of the checkpointed key
table, where a fat bucket is just a skewed join key that AQE can
split across tasks. These tests pin both the *shape* (no
``collect_list`` in the plan, a join present) and the *semantics*
(an all-identical corpus yields exactly C(n,2) verified pairs).
"""

from __future__ import annotations

import pytest

from dbt_eamples_spark.operators.dedup import (
    dedup_minhash,
    dedup_simhash,
)

BOILERPLATE = (
    "this page is intentionally left blank please refer to the index "
    "for further navigation and contact support if the problem persists"
)
N_DUPS = 30


@pytest.fixture(scope="module")
def fat_dir(spark, tmp_path_factory) -> str:
    """A corpus where 30 of 40 docs are byte-identical boilerplate —
    one band bucket holds 30 docs in every band."""
    root = tmp_path_factory.mktemp("fatbucket")
    rows = [(i, BOILERPLATE, "en", "synthetic", len(BOILERPLATE)) for i in range(N_DUPS)]
    rows += [
        (
            100 + i,
            f"unique document {i} with words alpha{i} beta{i} gamma{i} "
            f"delta{i} epsilon{i} zeta{i} eta{i} theta{i}",
            "en",
            "synthetic",
            80,
        )
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(root / "documents.parquet"))
    return str(root)


class TestFatBucket:
    def test_minhash_handles_degenerate_bucket(self, spark, fat_dir):
        pairs = dedup_minhash(spark, fat_dir).collect()
        dup_pairs = {
            (r.doc_a, r.doc_b) for r in pairs if r.doc_a < N_DUPS and r.doc_b < N_DUPS
        }
        # all C(30,2) identical-doc pairs surface with jaccard 1.0
        assert len(dup_pairs) == N_DUPS * (N_DUPS - 1) // 2
        assert all(r.jaccard == 1.0 for r in pairs if (r.doc_a, r.doc_b) in dup_pairs)

    def test_simhash_handles_degenerate_bucket(self, spark, fat_dir):
        pairs = dedup_simhash(spark, fat_dir).collect()
        dup_pairs = {
            (r.doc_a, r.doc_b) for r in pairs if r.doc_a < N_DUPS and r.doc_b < N_DUPS
        }
        assert len(dup_pairs) == N_DUPS * (N_DUPS - 1) // 2
        assert all(r.hamming == 0 for r in pairs if (r.doc_a, r.doc_b) in dup_pairs)

    def test_candidate_stage_is_join_not_aggregation(self, spark, sf_dir):
        """The pair-expansion must never buffer a bucket: no
        collect_list anywhere in either plan, and a join present."""
        for op in (dedup_minhash, dedup_simhash):
            plan = op(spark, sf_dir)._jdf.queryExecution().toString()
            assert "collect_list" not in plan, op.__name__
            assert "Join" in plan, op.__name__

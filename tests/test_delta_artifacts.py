"""Delta maintenance for the pair-graph artifacts (VERDICT r8 #2):
`ngram_pairs_apply_delta` and `triangle_credits_apply_delta` must be
ROW-IDENTICAL to a from-scratch rebuild on the union corpus, while
paying only delta-side tokenize/hash/enumeration (the base side is
served by the persisted block index / edge artifact / credits).
The split fixtures deliberately include PARTIAL deltas (lineitem
rows extending existing baskets) so the touched-order rebuild path
is exercised, not just whole-new-group appends."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_eamples_spark import artifacts as A
from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators import dedup as D
from dbt_eamples_spark.operators import graph as G


@pytest.fixture()
def art_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "arts"))
    A.ARTIFACT_EVENTS.clear()
    self_caches = [
        D._NGRAM_PAIRS_CACHE,
        D._NGRAM_BLOCK_INDEX_CACHE,
        D._DOC_SHINGLES_CACHE,
        G._EDGES_CACHE,
        G._TRIANGLE_CREDITS_CACHE,
    ]
    for c in self_caches:
        c.clear()
    yield str(tmp_path / "arts")
    for c in self_caches:
        c.clear()


def _events(kind):
    return [e for k, e in A.ARTIFACT_EVENTS if k == kind]


class TestNgramPairsDelta:
    def _split(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, sf_dir, "documents")
        base = docs.filter(F.col("doc_id") % 10 != 0)
        delta = docs.filter(F.col("doc_id") % 10 == 0)
        base_dir = str(tmp_path / "base")
        os.makedirs(base_dir, exist_ok=True)
        base.write.parquet(os.path.join(base_dir, "documents.parquet"))
        return base_dir, delta

    def test_delta_merge_equals_full_rebuild(
        self, spark, sf_dir, tmp_path, art_dir
    ):
        base_dir, delta = self._split(spark, sf_dir, tmp_path)
        merged = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in D.ngram_pairs_apply_delta(
                spark, base_dir, delta
            ).collect()
        }
        full = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in D._ngram_pairs(spark, sf_dir).collect()
        }
        assert merged == full and len(full) > 0
        # the delta path never re-built the base pair table from
        # scratch beyond its one-time base build; base-side events
        # are builds of base artifacts only
        assert _events("ngram_jaccard_pairs").count("build") == 2  # base + full oracle
        # the delta-gained pairs are real: the split has cross pairs
        base_only = {
            (r.doc_a, r.doc_b)
            for r in D._ngram_pairs(spark, base_dir).collect()
        }
        assert {(a, b) for a, b, _ in full} > base_only

    def test_publish_makes_full_query_warm(
        self, spark, sf_dir, tmp_path, art_dir
    ):
        base_dir, delta = self._split(spark, sf_dir, tmp_path)
        fp_full = A.corpus_fingerprint(sf_dir, "documents")
        D.ngram_pairs_apply_delta(
            spark, base_dir, delta, publish_fingerprint=fp_full
        ).collect()
        A.ARTIFACT_EVENTS.clear()
        D._NGRAM_PAIRS_CACHE.clear()
        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in D.dedup_ngram_jaccard(spark, sf_dir).collect()
        }
        assert _events("ngram_jaccard_pairs") == ["reuse"]
        # and the published table is the rebuild-identical one
        D._NGRAM_PAIRS_CACHE.clear()
        for p in [os.path.join(art_dir, d) for d in os.listdir(art_dir)
                  if d.startswith("ngram_jaccard_pairs")]:
            import shutil

            shutil.rmtree(p)
        full = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in D._ngram_pairs(spark, sf_dir).collect()
        }
        assert got == full


class TestTriangleCreditsDelta:
    def _split(self, spark, sf_dir, tmp_path):
        li = load_table(spark, sf_dir, "lineitem")
        # mixed delta: whole new orders (orderkey % 13 == 0) AND
        # partial extensions of surviving baskets (linenumber-keyed
        # rows of other orders) — both ingestion shapes
        is_delta = (F.col("l_orderkey") % 13 == 0) | (
            (F.col("l_orderkey") % 13 == 1) & (F.col("l_linenumber") >= 3)
        )
        base = li.filter(~is_delta)
        delta = li.filter(is_delta)
        base_dir = str(tmp_path / "libase")
        os.makedirs(base_dir, exist_ok=True)
        base.write.parquet(os.path.join(base_dir, "lineitem.parquet"))
        return base_dir, delta

    def test_delta_merge_equals_full_rebuild(
        self, spark, sf_dir, tmp_path, art_dir
    ):
        base_dir, delta = self._split(spark, sf_dir, tmp_path)
        assert delta.count() > 0
        merged = {
            (r.node, r.n_triangles)
            for r in G.triangle_credits_apply_delta(
                spark, base_dir, delta
            ).collect()
        }
        full = {
            (r.node, r.n_triangles)
            for r in G._triangle_credits(spark, sf_dir).collect()
        }
        assert merged == full and len(full) > 0

    def test_publish_makes_full_query_warm(
        self, spark, sf_dir, tmp_path, art_dir
    ):
        base_dir, delta = self._split(spark, sf_dir, tmp_path)
        fp_full = A.corpus_fingerprint(sf_dir, "lineitem")
        G.triangle_credits_apply_delta(
            spark, base_dir, delta, publish_fingerprint=fp_full
        ).collect()
        A.ARTIFACT_EVENTS.clear()
        G._TRIANGLE_CREDITS_CACHE.clear()
        G.graph_triangle_count(spark, sf_dir).collect()
        assert _events("triangle_credits") == ["reuse"]

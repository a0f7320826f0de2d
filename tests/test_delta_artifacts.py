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


class TestBandIndexDeltas:
    """The two LSH band indexes are per-doc state, so their delta
    path is a pure append — merged index must equal a from-scratch
    build over the union corpus (both indexes keep the fixture's
    %INCR_MOD corpus convention on their own dir, so the test's
    delta uses doc_id % 10 == 7 rows: corpus-side in the full dir,
    absent from the base dir)."""

    def _split_docs(self, spark, sf_dir, tmp_path, name):
        docs = load_table(spark, sf_dir, "documents")
        base = docs.filter(F.col("doc_id") % 10 != 7)
        delta = docs.filter(F.col("doc_id") % 10 == 7)
        base_dir = str(tmp_path / name)
        os.makedirs(base_dir, exist_ok=True)
        base.write.parquet(os.path.join(base_dir, "documents.parquet"))
        return base_dir, delta

    def test_minhash_index_delta(self, spark, sf_dir, tmp_path, art_dir):
        base_dir, delta = self._split_docs(spark, sf_dir, tmp_path, "mb")
        merged = {
            (r.corpus_doc, r.band, r.bucket)
            for r in D.minhash_band_index_apply_delta(
                spark, base_dir, delta
            ).collect()
        }
        full = {
            (r.corpus_doc, r.band, r.bucket)
            for r in D.minhash_band_index(spark, sf_dir).collect()
        }
        assert merged == full and len(full) > 0

    def test_phash_index_delta(self, spark, sf_dir, tmp_path, art_dir):
        from dbt_eamples_spark.operators import multimodal as M

        M._PHASH_BAND_INDEX_CACHE.clear()
        base_dir, delta = self._split_docs(spark, sf_dir, tmp_path, "pb")
        merged = {
            tuple(r) for r in M.phash_band_index_apply_delta(
                spark, base_dir, delta.select("doc_id")
            ).collect()
        }
        M._PHASH_BAND_INDEX_CACHE.clear()
        full = {
            tuple(r)
            for r in M.phash_band_index(spark, sf_dir).collect()
        }
        M._PHASH_BAND_INDEX_CACHE.clear()
        assert merged == full and len(full) > 0


class TestSpanArtifactsDelta:
    def _split(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, sf_dir, "documents")
        base = docs.filter(F.col("doc_id") % 10 != 3)
        delta = docs.filter(F.col("doc_id") % 10 == 3)
        base_dir = str(tmp_path / "sbase")
        os.makedirs(base_dir, exist_ok=True)
        base.write.parquet(os.path.join(base_dir, "documents.parquet"))
        return base_dir, delta

    def _fresh(self):
        D._SPAN_PROFILE_CACHE.clear()
        D._SPAN_DUP_STATS_CACHE.clear()
        D._DOC_SPAN_INDEX_CACHE.clear()
        D._SPAN_HASH_INDEX_CACHE.clear()

    def test_delta_merge_equals_full_rebuild(
        self, spark, sf_dir, tmp_path, art_dir
    ):
        self._fresh()
        base_dir, delta = self._split(spark, sf_dir, tmp_path)
        profile, dup_stats = D.span_artifacts_apply_delta(
            spark, base_dir, delta
        )
        got_p = {tuple(r) for r in profile.collect()}
        got_s = {tuple(r) for r in dup_stats.collect()}
        self._fresh()
        want_p = {
            tuple(r) for r in D._span_profile(spark, sf_dir).collect()
        }
        want_s = {
            tuple(r) for r in D._span_dup_stats(spark, sf_dir).collect()
        }
        assert got_s == want_s and len(want_s) > 0
        assert got_p == want_p and len(want_p) > 0
        # the split really exercises the singleton-crossing path:
        # some base doc's n_dup_spans changed vs the base-only world
        self._fresh()
        base_p = {
            r.doc_id: r.n_dup_spans
            for r in D._span_profile(spark, base_dir).collect()
        }
        changed = [
            (d, nd) for (d, _ns, nd) in got_p
            if d in base_p and base_p[d] != nd
        ]
        assert changed, "split produced no crossing hashes — weak fixture"

    def test_publish_makes_full_queries_warm(
        self, spark, sf_dir, tmp_path, art_dir
    ):
        self._fresh()
        base_dir, delta = self._split(spark, sf_dir, tmp_path)
        fp_full = A.corpus_fingerprint(sf_dir, "documents")
        p, s = D.span_artifacts_apply_delta(
            spark, base_dir, delta, publish_fingerprint=fp_full
        )
        p.collect(), s.collect()
        self._fresh()
        A.ARTIFACT_EVENTS.clear()
        D.dedup_substring_spans(spark, sf_dir).collect()
        kinds = {k for k, e in A.ARTIFACT_EVENTS if e == "build"}
        assert "span_profile" not in kinds and "span_dup_stats" not in kinds


class TestEmptyDeltaIdentity:
    """An EMPTY delta batch must be an exact no-op for every
    apply_delta path — the daily-ingest edge case (a scheduled run
    with nothing new) that silently corrupting merges fail."""

    def test_all_paths_identity_on_empty_delta(
        self, spark, sf_dir, tmp_path, art_dir
    ):
        from dbt_eamples_spark.operators import multimodal as M

        docs = load_table(spark, sf_dir, "documents")
        li = load_table(spark, sf_dir, "lineitem")
        empty_docs = docs.limit(0)
        empty_li = li.limit(0)

        pairs = {
            tuple(r)
            for r in D.ngram_pairs_apply_delta(
                spark, sf_dir, empty_docs
            ).collect()
        }
        assert pairs == {
            tuple(r) for r in D._ngram_pairs(spark, sf_dir).collect()
        }

        credits = {
            tuple(r)
            for r in G.triangle_credits_apply_delta(
                spark, sf_dir, empty_li
            ).collect()
        }
        assert credits == {
            tuple(r)
            for r in G._triangle_credits(spark, sf_dir).collect()
        }

        p, st = D.span_artifacts_apply_delta(spark, sf_dir, empty_docs)
        assert {tuple(r) for r in p.collect()} == {
            tuple(r) for r in D._span_profile(spark, sf_dir).collect()
        }
        assert {tuple(r) for r in st.collect()} == {
            tuple(r) for r in D._span_dup_stats(spark, sf_dir).collect()
        }

        assert {
            tuple(r)
            for r in D.minhash_band_index_apply_delta(
                spark, sf_dir, empty_docs
            ).collect()
        } == {
            tuple(r)
            for r in D.minhash_band_index(spark, sf_dir).collect()
        }

        M._PHASH_BAND_INDEX_CACHE.clear()
        assert {
            tuple(r)
            for r in M.phash_band_index_apply_delta(
                spark, sf_dir, empty_docs.select("doc_id")
            ).collect()
        } == {
            tuple(r)
            for r in M.phash_band_index(spark, sf_dir).collect()
        }
        M._PHASH_BAND_INDEX_CACHE.clear()

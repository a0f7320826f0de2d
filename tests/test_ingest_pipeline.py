"""The composed ingest loop (VERDICT r9 #3): micro-batch → idempotent
append → ALL document indexes delta-maintained + published →
incremental probe report. The contract under test:

(a) after two batches, every artifact in the store is row-identical
    to a ONE-SHOT build over the final corpus;
(b) each batch's probe output matches the batch-restricted full
    query on the corpus as of that batch;
(c) re-delivering the batches appends zero rows and publishes
    nothing (the existing idempotence contract, preserved).

Batch 2 is the load-bearing case: its apply_delta calls must find
every base artifact WARM at the post-batch-1 fingerprint (published
by batch 1), never re-tokenizing the grown corpus — asserted through
ARTIFACT_EVENTS."""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from dbt_eamples_spark import artifacts as A
from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators import dedup as D
from dbt_eamples_spark.operators import graph as G
from dbt_eamples_spark.operators import multimodal as M
from dbt_eamples_spark.streaming import ingest as I


def _ctr(rows):
    # array columns (doc_shingles.shingles) need a hashable form
    return Counter(
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in rows
    )


def _clear_l1():
    for c in [
        D._DOC_SHINGLES_CACHE,
        D._NGRAM_PAIRS_CACHE,
        D._NGRAM_BLOCK_INDEX_CACHE,
        D._CLUSTER_VERDICTS_CACHE,
        D._MINHASH_BAND_INDEX_FULL_CACHE,
        D._SPAN_PROFILE_CACHE,
        D._SPAN_DUP_STATS_CACHE,
        D._DOC_SPAN_INDEX_CACHE,
        D._SPAN_HASH_INDEX_CACHE,
        M._PHASH_BAND_INDEX_CACHE,
        G._EDGES_CACHE,
    ]:
        c.clear()


@pytest.fixture()
def art_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "arts"))
    A.ARTIFACT_EVENTS.clear()
    _clear_l1()
    yield str(tmp_path / "arts")
    _clear_l1()


# builders that read the current corpus state from scratch, by kind
_BUILDERS = {
    "doc_shingles": lambda s, d: D.doc_shingles(s, d),
    "ngram_block_index": lambda s, d: D._ngram_block_index(s, d),
    "ngram_jaccard_pairs": lambda s, d: D._ngram_pairs(s, d),
    "minhash_band_index": lambda s, d: D.minhash_band_index(s, d),
    "minhash_band_index_full": lambda s, d: D.minhash_band_index_full(s, d),
    "phash_band_index": lambda s, d: M.phash_band_index(s, d),
    "span_profile": lambda s, d: D._span_profile(s, d),
    "span_dup_stats": lambda s, d: D._span_dup_stats(s, d),
    "doc_span_index": lambda s, d: D._doc_span_index(s, d),
    "span_hash_index": lambda s, d: D._span_hash_index(s, d),
    "cluster_labels": lambda s, d: D.cluster_labels(s, d),
}


class TestIngestPipeline:
    def _setup(self, spark, sf_dir, tmp_path):
        docs = load_table(spark, sf_dir, "documents")
        corpus_dir = str(tmp_path / "corpus")
        os.makedirs(corpus_dir, exist_ok=True)
        docs.filter(
            (F.col("doc_id") % 10 >= 1) & (F.col("doc_id") % 10 <= 7)
        ).write.parquet(os.path.join(corpus_dir, "documents.parquet"))
        b1 = docs.filter(F.col("doc_id") % 10 == 8)
        # batch 2 carries %10 == 0 ids on purpose: the convention
        # filter inside the band-index deltas must hold end-to-end
        b2 = docs.filter(
            (F.col("doc_id") % 10 == 9) | (F.col("doc_id") % 10 == 0)
        )
        return corpus_dir, b1, b2

    def test_two_batch_replay(self, spark, sf_dir, tmp_path, art_dir):
        corpus_dir, b1, b2 = self._setup(spark, sf_dir, tmp_path)

        r1 = I.ingest_documents_batch(
            spark, b1, corpus_dir, maintain_artifacts=True
        )
        assert r1["rows_appended"] == b1.count()
        assert set(r1["artifacts_published"]) == set(
            I.DOCUMENT_ARTIFACT_KINDS
        )

        # (b) batch-1 probe == minhash pairs of the corpus-as-of-now
        # restricted to pairs involving batch-1 docs
        _clear_l1()
        b1_ids = {r.doc_id for r in b1.select("doc_id").collect()}
        full_now = D.dedup_minhash(spark, corpus_dir).collect()
        want = sum(
            1 for r in full_now
            if r.doc_a in b1_ids or r.doc_b in b1_ids
        )
        assert r1["near_dup_pairs"] == want

        # batch 2 is delivered OVERLAPPING (b1 rows re-sent alongside
        # the new b2 rows — the at-least-once delivery a file drop
        # gives you): the anti-join must strip the b1 half and the
        # maintenance must see only the truly-new rows. Every base
        # read must be WARM (published by batch 1).
        A.ARTIFACT_EVENTS.clear()
        _clear_l1()
        r2 = I.ingest_documents_batch(
            spark, b1.unionByName(b2), corpus_dir,
            maintain_artifacts=True,
        )
        assert r2["rows_appended"] == b2.count()
        base_builds = {
            k for k, e in A.ARTIFACT_EVENTS
            if e == "build" and k in I.DOCUMENT_ARTIFACT_KINDS
        }
        # the only builds are the batch-2 publishes themselves: one
        # per kind; base reads during planning were all reuses
        events_by_kind = Counter(
            k for k, e in A.ARTIFACT_EVENTS
            if e == "build" and k in I.DOCUMENT_ARTIFACT_KINDS
        )
        assert base_builds == set(I.DOCUMENT_ARTIFACT_KINDS)
        assert all(v == 1 for v in events_by_kind.values()), (
            f"re-build of a base artifact crept in: {events_by_kind}"
        )

        # (a) every artifact equals a one-shot build over the union
        from dbt_eamples_spark.artifacts import corpus_fingerprint

        fp_final = corpus_fingerprint(corpus_dir, "documents")
        incremental = {}
        for kind in I.DOCUMENT_ARTIFACT_KINDS:
            path = A.artifact_path(kind, fp_final)
            assert os.path.exists(os.path.join(path, "_SUCCESS")), kind
            incremental[kind] = _ctr(
                spark.read.parquet(path).collect()
            )
        # scratch rebuild in a separate store
        os.environ["SPARK_GRAFT_ARTIFACTS"] = str(
            tmp_path / "arts_scratch"
        )
        _clear_l1()
        try:
            for kind in I.DOCUMENT_ARTIFACT_KINDS:
                want = _ctr(_BUILDERS[kind](spark, corpus_dir).collect())
                assert incremental[kind] == want, (
                    f"{kind}: incremental != one-shot rebuild"
                )
                assert len(want) > 0, kind
        finally:
            os.environ["SPARK_GRAFT_ARTIFACTS"] = art_dir
            _clear_l1()

        # (c) re-delivering both batches is a no-op
        A.ARTIFACT_EVENTS.clear()
        for b in (b1, b2):
            r = I.ingest_documents_batch(
                spark, b, corpus_dir, maintain_artifacts=True
            )
            assert r == {
                "rows_appended": 0,
                "near_dup_pairs": 0,
                "artifacts_published": [],
            }
        assert not [e for _, e in A.ARTIFACT_EVENTS if e == "build"]
        assert corpus_fingerprint(corpus_dir, "documents") == fp_final

    def test_streaming_form(self, spark, sf_dir, tmp_path, art_dir):
        """The foreachBatch wrapper drains the source with
        AvailableNow and reports per batch; a rerun with a fresh
        checkpoint appends nothing."""
        corpus_dir, b1, _ = self._setup(spark, sf_dir, tmp_path)
        src = str(tmp_path / "incoming")
        os.makedirs(src, exist_ok=True)
        b1.coalesce(1).write.parquet(os.path.join(src, "b1.parquet"))

        reports = I.stream_document_ingest(
            spark, src, corpus_dir, str(tmp_path / "ckpt1"),
            maintain_artifacts=True,
        )
        assert [r["rows_appended"] for r in reports] == [b1.count()]
        assert set(reports[0]["artifacts_published"]) == set(
            I.DOCUMENT_ARTIFACT_KINDS
        )
        # rerun from scratch (fresh checkpoint): anti-join guard
        # makes the replay a zero-row no-op
        reports2 = I.stream_document_ingest(
            spark, src, corpus_dir, str(tmp_path / "ckpt2"),
            maintain_artifacts=True,
        )
        assert [r["rows_appended"] for r in reports2] == [0]

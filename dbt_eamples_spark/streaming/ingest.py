"""The daily ingest loop composed end-to-end (VERDICT r9 #3): the
apply_delta functions existed as a library; this module wires them
into the micro-batch pipeline a 100 TB deployment actually runs —

    micro-batch arrives → idempotent corpus append → EVERY persisted
    document index delta-maintained and PUBLISHED under the updated
    corpus fingerprint → incremental near-dup probe reported for the
    batch.

The load-bearing property (pytest-locked in
tests/test_ingest_pipeline.py): after N batches, every artifact in
the store is row-identical to a ONE-SHOT build over the final corpus
— so a query running between any two batches sees exactly the state
a rebuild would produce, while each batch paid delta-sized cost. A
second batch's apply_delta calls find every base artifact warm at
the post-batch-1 fingerprint (that is why the composer also
maintains the plain per-doc artifacts ``doc_shingles`` /
``ngram_block_index`` / ``minhash_band_index_full`` — without them a
later batch would silently re-tokenize the grown corpus).

Two-phase shape, forced by the fingerprint scheme: the union
corpus's fingerprint (file path/size/mtime) only exists AFTER the
append, but the apply_delta frames must be constructed BEFORE it
(their base reads resolve the CURRENT corpus fingerprint to find the
warm artifacts). So the composer plans all merged frames against the
pre-append state (delta-sized inputs are eagerly checkpointed inside
the apply_delta functions; base sides are on-disk artifact scans,
both stable across the append), appends, fingerprints, and only
then publishes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import table_path

# every document-family artifact kind the composer maintains, in
# publish order (upstream artifacts first, purely for readability —
# each frame is already fully planned)
DOCUMENT_ARTIFACT_KINDS = [
    "doc_shingles",
    "ngram_block_index",
    "ngram_jaccard_pairs",
    "minhash_band_index",
    "minhash_band_index_full",
    "phash_band_index",
    "span_profile",
    "span_dup_stats",
    "doc_span_index",
    "span_hash_index",
    "cluster_labels",
]


def plan_document_artifact_deltas(
    spark: SparkSession, corpus_dir: str, fresh_docs: DataFrame
) -> dict[str, DataFrame]:
    """Phase 1: merged frames for every document artifact, computed
    against the CURRENT (pre-append) corpus state. ``fresh_docs``
    must already be anti-joined against the corpus (the ingest
    loop's idempotence guard IS the new-ids-only guarantee, so the
    delta probes run with ``assume_new_ids=True``)."""
    from dbt_eamples_spark.operators import dedup as D
    from dbt_eamples_spark.operators import multimodal as M

    frames: dict[str, DataFrame] = {}
    frames["doc_shingles"] = D.doc_shingles_apply_delta(
        spark, corpus_dir, fresh_docs
    )
    frames["ngram_block_index"] = D.ngram_block_index_apply_delta(
        spark, corpus_dir, fresh_docs
    )
    frames["ngram_jaccard_pairs"] = D.ngram_pairs_apply_delta(
        spark, corpus_dir, fresh_docs, assume_new_ids=True
    )
    frames["minhash_band_index"] = D.minhash_band_index_apply_delta(
        spark, corpus_dir, fresh_docs
    )
    frames["minhash_band_index_full"] = (
        D.minhash_band_index_full_apply_delta(spark, corpus_dir, fresh_docs)
    )
    frames["phash_band_index"] = M.phash_band_index_apply_delta(
        spark, corpus_dir, fresh_docs.select("doc_id")
    )
    profile, dup_stats, dsi, shi = D.span_artifacts_apply_delta(
        spark, corpus_dir, fresh_docs, return_indexes=True
    )
    frames["span_profile"] = profile
    frames["span_dup_stats"] = dup_stats
    frames["doc_span_index"] = dsi
    frames["span_hash_index"] = shi
    frames["cluster_labels"] = D.cluster_verdicts_apply_delta(
        spark, corpus_dir, fresh_docs, assume_new_ids=True
    )
    return frames


def publish_artifacts(
    spark: SparkSession, frames: dict[str, DataFrame], fingerprint: str
) -> list[str]:
    """Phase 2: land every planned frame in the artifact store under
    the (post-append) union fingerprint. Idempotent: an existing
    artifact at (kind, fingerprint) is left alone (load_or_build's
    publish-by-rename contract)."""
    from dbt_eamples_spark.artifacts import load_or_build

    published = []
    for kind, df in frames.items():
        load_or_build(spark, kind, fingerprint, lambda df=df: df)
        published.append(kind)
    return published


def ingest_documents_batch(
    spark: SparkSession,
    batch: DataFrame,
    corpus_dir: str,
    *,
    maintain_artifacts: bool = False,
) -> dict:
    """One micro-batch of the document ingest loop; returns the run
    report row. Idempotent: re-delivering the same batch appends
    zero rows and touches nothing."""
    from dbt_eamples_spark.artifacts import corpus_fingerprint
    from dbt_eamples_spark.operators import dedup as D

    docs_path = table_path(corpus_dir, "documents")
    corpus = spark.read.parquet(docs_path)
    fresh = (
        batch.select(*corpus.columns)  # corpus column order
        .join(corpus.select("doc_id"), "doc_id", "left_anti")
        .localCheckpoint(eager=True)  # pinned: consumed by the plan,
        # the probe, and the append — and must survive the append
    )
    n = fresh.count()
    if n == 0:
        return {
            "rows_appended": 0,
            "near_dup_pairs": 0,
            "artifacts_published": [],
        }
    frames: dict[str, DataFrame] = {}
    n_pairs = 0
    if maintain_artifacts:
        frames = plan_document_artifact_deltas(spark, corpus_dir, fresh)
        # the batch's near-dup probe: verified pairs the batch gained
        # against the corpus and within itself (collision-bounded)
        probe = D.minhash_pairs_delta_new(
            spark, corpus_dir, fresh, assume_new_ids=True
        ).localCheckpoint(eager=True)
        n_pairs = probe.count()
    fresh.write.mode("append").parquet(docs_path)
    published: list[str] = []
    if maintain_artifacts:
        fp_union = corpus_fingerprint(corpus_dir, "documents")
        published = publish_artifacts(spark, frames, fp_union)
    return {
        "rows_appended": n,
        "near_dup_pairs": n_pairs,
        "artifacts_published": published,
    }


def stream_document_ingest(
    spark: SparkSession,
    source_dir: str,
    corpus_dir: str,
    checkpoint: str,
    *,
    maintain_artifacts: bool = False,
) -> list[dict]:
    """Structured-Streaming form of the loop: file source over
    ``source_dir`` (parquet document files dropped by an upstream
    fetcher) → ``foreachBatch`` running
    :func:`ingest_documents_batch`, drained with AvailableNow. The
    per-batch run reports (rows appended, near-dup pairs found,
    artifacts published) are returned in batch order — the row the
    reference posts per cron pull, extended with the index
    maintenance a 100 TB corpus needs."""
    docs_path = table_path(corpus_dir, "documents")
    schema = spark.read.parquet(docs_path).schema
    src = spark.readStream.schema(schema).parquet(
        os.path.join(source_dir, "*.parquet")
    )
    reports: list[dict] = []

    def handle(batch: DataFrame, batch_id: int) -> None:
        row = ingest_documents_batch(
            spark, batch, corpus_dir,
            maintain_artifacts=maintain_artifacts,
        )
        row["batch_id"] = batch_id
        reports.append(row)

    q = (
        src.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    return reports


__all__ = [
    "DOCUMENT_ARTIFACT_KINDS",
    "plan_document_artifact_deltas",
    "publish_artifacts",
    "ingest_documents_batch",
    "stream_document_ingest",
]

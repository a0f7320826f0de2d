"""Persisted index artifacts (VERDICT r4 #6): the near-dup pair
graph, LSH band indexes, and trained PQ codebooks are INDEXES — at
100 TB they are built once, stored, and probed by every later query
and ingest delta. The session-dict caches the operators used through
round 4 die with the SparkContext; this module gives them a disk
tier: parquet artifacts under ``_artifacts/`` keyed by a corpus
FINGERPRINT, so a second session (or a second process) reuses the
index instead of recomputing it, and an ingest delta can probe an
index built days earlier.

Fingerprint = md5 over each source parquet file's (path, size,
mtime) — the standard "did the input change" key (content hashing
would scan the corpus the artifact exists to avoid). Any rewrite of
the source invalidates the key and the next call rebuilds.

Parquet preserves float64 bit patterns exactly, so artifact reuse
cannot perturb the engine-exact guarantees (oracle hashes are
unchanged whether an index was built or loaded).

``ARTIFACT_EVENTS`` records (kind, "build" | "reuse") per call — the
observability hook the reuse tests assert on.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from dbt_eamples_spark.catalog import table_path

# (kind, "build"|"reuse") log, newest last — test/debug observability
ARTIFACT_EVENTS: list[tuple[str, str]] = []


def artifacts_root() -> str:
    """Resolved per call so tests (and deployments) can point the
    store elsewhere via SPARK_GRAFT_ARTIFACTS."""
    return os.environ.get(
        "SPARK_GRAFT_ARTIFACTS", "/root/repo/_artifacts"
    )


def corpus_fingerprint(sf_dir: str, *tables: str) -> str:
    """md5 over (abs path, size, mtime_ns) of each source table's
    parquet file — cheap (metadata-only) and rewrite-sensitive."""
    h = hashlib.md5()
    for t in sorted(tables):
        p = table_path(sf_dir, t)
        st = os.stat(p)
        h.update(f"{os.path.abspath(p)}:{st.st_size}:{st.st_mtime_ns};".encode())
    return h.hexdigest()[:16]


def artifact_path(kind: str, fingerprint: str) -> str:
    return os.path.join(artifacts_root(), kind, fingerprint)


def load_or_build(
    spark: SparkSession,
    kind: str,
    fingerprint: str,
    build,
) -> DataFrame:
    """Return the ``kind`` artifact for ``fingerprint``, building it
    with ``build()`` (a () -> DataFrame) only on miss. The artifact
    is written ONCE (atomic: parquet commit protocol renames a
    _temporary dir, so a concurrent reader never sees partial data);
    hits read the parquet back — at scale that read is the bucketed/
    pruned scan the index exists to provide."""
    path = artifact_path(kind, fingerprint)
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        ARTIFACT_EVENTS.append((kind, "reuse"))
        return spark.read.parquet(path)
    df = build()
    df.write.mode("overwrite").parquet(path)
    ARTIFACT_EVENTS.append((kind, "build"))
    return spark.read.parquet(path)

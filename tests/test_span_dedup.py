"""Exact-substring span dedup (Lee et al. 2022 shape): brute-python
cross-checks of the per-doc duplication ratio and the corpus top-span
report, plus the short-doc guard (Spark's sequence() DESCENDS when
start > stop — an unguarded span expression fabricates spans)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators.dedup import (
    SPAN_TOKENS,
    TOP_SPANS_K,
    dedup_substring_spans,
    dedup_top_spans,
)


def _brute_spans(spark, sf_dir):
    """{doc_id: [span md5, ...]} via plain python tokenization."""
    out = {}
    for r in load_table(spark, sf_dir, "documents").collect():
        toks = r.text.strip().split()
        out[r.doc_id] = [
            hashlib.md5(
                " ".join(toks[i : i + SPAN_TOKENS]).encode()
            ).hexdigest()
            for i in range(len(toks) - SPAN_TOKENS + 1)
        ]
    return out

def test_per_doc_ratio_matches_brute(spark, sf_dir):
    spans = _brute_spans(spark, sf_dir)
    docs_of = defaultdict(set)
    for d, hs in spans.items():
        for h in hs:
            docs_of[h].add(d)
    want = {}
    for d, hs in spans.items():
        dup = sum(1 for h in hs if len(docs_of[h]) > 1)
        ratio = round(dup / len(hs), 6) if hs else None
        want[d] = (len(hs), dup, ratio)
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_ratio)
        for r in dedup_substring_spans(spark, sf_dir).collect()
    }
    assert set(got) == set(spans)  # every document appears
    assert got == want
    # the fixture corpus genuinely contains cross-doc duplication
    assert any(v[1] > 0 for v in got.values())


def test_top_spans_matches_brute(spark, sf_dir):
    spans = _brute_spans(spark, sf_dir)
    n_docs = defaultdict(set)
    n_occ = defaultdict(int)
    for d, hs in spans.items():
        for h in hs:
            n_docs[h].add(d)
            n_occ[h] += 1
    want = sorted(
        (
            (len(ds), n_occ[h], h)
            for h, ds in n_docs.items()
            if len(ds) > 1
        ),
        key=lambda t: (-t[0], -t[1], t[2]),
    )[:TOP_SPANS_K]
    got = [
        (r.n_docs, r.n_occurrences, r.h)
        for r in dedup_top_spans(spark, sf_dir).collect()
    ]
    assert got == want and len(got) == TOP_SPANS_K


def test_short_docs_contribute_no_spans(spark):
    """A doc shorter than SPAN_TOKENS must yield zero spans, not a
    descending-sequence artifact."""
    from dbt_eamples_spark.operators import dedup as dd
    import tempfile

    spark_df = spark.createDataFrame(
        [(1, "only three tokens", "en", "s", 17),
         (2, " ".join(["tok"] * (SPAN_TOKENS + 2)), "en", "s", 99)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        spark_df.coalesce(1).write.parquet(f"{tmp}/documents.parquet")
        rows = {
            r.doc_id: (r.n_spans, r.dup_ratio)
            for r in dd.dedup_substring_spans(spark, tmp).collect()
        }
    assert rows[1] == (0, None)
    assert rows[2][0] == 3  # (k+2) - k + 1 spans


def test_top_spans_uses_topk_not_full_sort(spark, sf_dir):
    plan = dedup_top_spans(spark, sf_dir)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

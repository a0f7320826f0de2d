"""Properties of the curation operators: decontamination,
repetition signals, sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_eamples_spark.operators.curation import (
    DECON_N,
    PACK_CTX,
    pack_concat_chunks,
    text_decontaminate,
)
from dbt_eamples_spark.operators.sampling import sample_stratified
from dbt_eamples_spark.operators.text import text_repetition_stats


def _py_ngrams(text: str, n: int) -> set[str]:
    toks = text.lower().split()
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


class TestDecontaminate:
    def test_hits_are_real_and_eval_excluded(self, spark, sf_dir):
        out = {r.doc_id: r.n_hits for r in text_decontaminate(spark, sf_dir).collect()}
        ev = {r.doc_id for r in sample_stratified(spark, sf_dir).collect()}
        assert not (set(out) & ev)
        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        }
        ev_grams = set()
        for d in ev:
            ev_grams |= _py_ngrams(docs[d], DECON_N)
        for doc_id, n_hits in out.items():
            overlap = _py_ngrams(docs[doc_id], DECON_N) & ev_grams
            assert len(overlap) == n_hits
        # and completeness: every non-eval doc with overlap is flagged
        for doc_id, text in docs.items():
            if doc_id in ev:
                continue
            expected = len(_py_ngrams(text, DECON_N) & ev_grams)
            assert out.get(doc_id, 0) == expected


class TestRepetitionStats:
    def test_fracs_match_python(self, spark, sf_dir):
        rows = text_repetition_stats(spark, sf_dir).collect()
        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        }
        assert {r.doc_id for r in rows} == set(docs)
        for r in rows[:50]:
            toks = docs[r.doc_id].lower().split()
            n = len(toks)
            assert abs(r.dup_word_frac - (1 - len(set(toks)) / n)) < 1e-6
            bigrams = (
                [" ".join(toks[i : i + 2]) for i in range(n - 1)]
                if n > 1
                else [toks[0]]
            )
            top = max(bigrams.count(b) for b in set(bigrams))
            assert abs(r.top_bigram_frac - top / max(n - 1, 1)) < 1e-6


class TestPackConcatChunks:
    def test_offsets_are_exact_prefix_sums(self, spark, sf_dir):
        rows = sorted(
            pack_concat_chunks(spark, sf_dir).collect(), key=lambda r: r.doc_id
        )
        acc = 0
        for r in rows:
            assert r.tok_offset == acc
            acc += r.n_tokens
            assert r.chunk_first == r.tok_offset // PACK_CTX
            assert r.chunk_last == (r.tok_offset + r.n_tokens - 1) // PACK_CTX
            assert r.n_chunks == r.chunk_last - r.chunk_first + 1

    def test_matches_single_window_reference(self, spark, sf_dir):
        """The two-phase distributed prefix sum must equal the naive
        one-task global window it replaces."""
        from pyspark.sql import Window

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        naive = (
            docs.select(
                "doc_id",
                F.size(F.split(F.lower(F.col("text")), r"\s+"))
                .cast("long")
                .alias("n"),
            )
            .withColumn(
                "off",
                F.sum("n").over(
                    Window.orderBy("doc_id").rowsBetween(
                        Window.unboundedPreceding, 0
                    )
                )
                - F.col("n"),
            )
            .collect()
        )
        expected = {r.doc_id: r.off for r in naive}
        got = {
            r.doc_id: r.tok_offset
            for r in pack_concat_chunks(spark, sf_dir).collect()
        }
        assert got == expected


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=40
    )
)
def test_prefix_offsets_property(spark, sizes):
    """Two-phase distributed prefix sum ≡ Python cumsum for arbitrary
    (doc_id, n_tokens) frames, including zero-size docs."""
    from dbt_eamples_spark.operators.curation import _prefix_offsets

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    got = {r.doc_id: r.tok_offset for r in _prefix_offsets(df).collect()}
    acc, expected = 0, {}
    for i, n in enumerate(sizes):
        expected[i] = acc
        acc += n
    assert got == expected

"""BPE merge-training tests: (1) a pure-python property proof that
the closed set-based merge selection the DuckDB oracle uses equals
the greedy left-to-right fold the Spark side uses, (2) an end-to-end
Spark-vs-DuckDB value comparison at sf0.001 (the same comparison the
driver gate runs at sf0.01), (3) merge-table sanity invariants."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_eamples_spark.operators.text import (
    BPE_MERGES,
    text_bpe_train,
)
from dbt_eamples_spark.oracles_ext import EXT_ORACLES

# slow lane (VERDICT r14 #2): BPE corpus build + oracle twin —
# excluded from the default run so `pytest tests/ -x -q` fits the
# driver's verify budget; the close ritual runs it via --runslow.
pytestmark = pytest.mark.slow


def greedy_fold(s: list[str], left: str, right: str) -> list[str]:
    """Reference greedy left-to-right merge (the Spark aggregate
    fold, operators/text.py:_bpe_merge_fold)."""
    out, skip = [], False
    for i in range(len(s)):
        if skip:
            skip = False
            continue
        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
            out.append(left + right)
            skip = True
        else:
            out.append(s[i])
    return out


def closed_form(s: list[str], left: str, right: str) -> list[str]:
    """The DuckDB oracle's set-based form (oracles_ext.py
    _bpe_oracle_sql): select matches at even offset from their
    consecutive-match run start; run start = 1 + last non-match."""
    n = len(s)
    m = [1 if s[i] == left and s[i + 1] == right else 0 for i in range(n - 1)]
    sel = []
    for i in range(n - 1):  # 0-based here; SQL is 1-based
        maxzero = max([k + 1 for k in range(i) if m[k] == 0], default=0)
        sel.append(m[i] == 1 and (i - maxzero) % 2 == 0)
    out = []
    for i in range(n):
        if i < n - 1 and sel[i]:
            out.append(left + right)
        elif i >= 1 and sel[i - 1]:
            continue
        else:
            out.append(s[i])
    return out


@given(
    w=st.text(alphabet="ab", min_size=2, max_size=20),
    left=st.sampled_from(["a", "b", "aa", "ab", "ba"]),
    right=st.sampled_from(["a", "b", "aa", "ab", "ba"]),
)
@settings(max_examples=400, deadline=None)
def test_closed_form_equals_greedy(w, left, right):
    s = list(w)
    assert closed_form(s, left, right) == greedy_fold(s, left, right)


@given(w=st.text(alphabet="abc", min_size=2, max_size=16))
@settings(max_examples=200, deadline=None)
def test_closed_form_equals_greedy_multichar_symbols(w):
    # after earlier merges symbols are multi-char: re-merge the
    # greedy output of ("a","b") with a pair touching merged syms
    s = greedy_fold(list(w), "a", "b")
    for pair in [("ab", "c"), ("ab", "ab"), ("c", "ab"), ("c", "c")]:
        assert closed_form(s, *pair) == greedy_fold(s, *pair)


@pytest.fixture(scope="module")
def merges(spark, sf_dir):
    return text_bpe_train(spark, sf_dir).collect()


def test_bpe_matches_duckdb_oracle(merges, sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(EXT_ORACLES["text_bpe_train"]).fetchall()
    got = [
        (r.step, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in merges
    ]
    assert got == want


def test_bpe_tokenize_matches_duckdb_oracle(spark, sf_dir):
    from dbt_eamples_spark.operators.text import text_bpe_tokenize

    got = sorted(
        (
            r.doc_id,
            r.n_chars_nws,
            r.n_ws_tokens,
            r.n_bpe_tokens,
            r.chars_per_token,
        )
        for r in text_bpe_tokenize(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(con.execute(EXT_ORACLES["text_bpe_tokenize"]).fetchall())
    assert got == want


def test_bpe_tokenize_invariants(spark, sf_dir):
    from dbt_eamples_spark.operators.text import text_bpe_tokenize
    from dbt_eamples_spark.sources.readers import load_table

    rows = text_bpe_tokenize(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        # merging only ever shortens a word's symbol sequence, and
        # every non-empty whitespace token contributes >= 1 BPE token
        assert r.n_bpe_tokens >= r.n_ws_tokens >= 0
        if r.n_bpe_tokens:
            assert r.chars_per_token is not None and r.chars_per_token > 0
        # a token has at least one char, so chars >= ws token count
        assert r.n_chars_nws >= r.n_ws_tokens


def test_bpe_merges_artifact_reused(spark, sf_dir, merges):
    """The tokenizer must consume the persisted merge artifact, not
    retrain: after the module fixture trained once, a tokenize call
    logs a reuse event for the bpe_merges kind."""
    from dbt_eamples_spark.artifacts import ARTIFACT_EVENTS
    from dbt_eamples_spark.operators.text import text_bpe_tokenize

    before = len(ARTIFACT_EVENTS)
    text_bpe_tokenize(spark, sf_dir).count()
    new = ARTIFACT_EVENTS[before:]
    assert ("bpe_merges", "reuse") in new
    assert ("bpe_merges", "build") not in new


def test_bpe_merge_table_invariants(merges):
    assert len(merges) == BPE_MERGES
    assert [r.step for r in merges] == list(range(1, BPE_MERGES + 1))
    for r in merges:
        assert r.merged == r.left_sym + r.right_sym
        assert r.pair_count > 0
    # a merge learned at step k can only reference symbols that are
    # single chars or outputs of earlier steps
    known = {chr(c) for c in range(ord("a"), ord("z") + 1)}
    for r in merges:
        assert r.left_sym in known and r.right_sym in known
        known.add(r.merged)

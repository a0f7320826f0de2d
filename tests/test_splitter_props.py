"""Property-based tests for the SQL script splitter (hypothesis).

The splitter is the one piece of hand-rolled parsing in the engine
(`plans/splitter.py`, mirroring the reference's semicolon split +
comment stripping at `connections.py:330-336,415-427`), so it gets
adversarial inputs: random quote/comment/semicolon soup must never
crash, never lose non-comment content, and must round-trip statement
boundaries.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dbt_eamples_spark.plans.splitter import split_statements

# fragments that stress the tokenizer states
_FRAGMENTS = st.sampled_from(
    [
        "SELECT 1",
        "a",
        ";",
        ";;",
        "'it''s'",
        "'a;b'",
        '"col;name"',
        "-- line; comment\n",
        "--tail comment no newline",
        "/* block ; comment */",
        "/* unterminated block",
        "'unterminated string",
        "\n",
        " ",
        "*/",
        "--",
        "'",
        '"',
    ]
)
_SOUP = st.lists(_FRAGMENTS, min_size=0, max_size=12).map("".join)


@settings(max_examples=300, deadline=None)
@given(_SOUP)
def test_never_crashes_and_never_empty_statements(sql):
    out = split_statements(sql)
    assert isinstance(out, list)
    for stmt in out:
        assert stmt.strip() == stmt and stmt  # trimmed, non-empty


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from(["SELECT 1", "SELECT 'a;b'", 'SELECT ";"']),
                min_size=1, max_size=8))
def test_statement_count_roundtrip(stmts):
    """Joining N quote-safe statements with ';' splits back into N."""
    out = split_statements(";".join(stmts) + ";")
    assert out == stmts


@settings(max_examples=200, deadline=None)
@given(_SOUP)
def test_idempotent_on_single_statements(sql):
    """Re-splitting any produced statement yields it back unchanged
    (statements contain no top-level semicolons or comments)."""
    for stmt in split_statements(sql):
        assert split_statements(stmt) == [stmt]


def test_semicolon_inside_line_comment_is_not_a_boundary():
    out = split_statements("SELECT 1 -- not; a boundary\n+ 2;")
    assert out == ["SELECT 1 \n+ 2"]


def test_semicolon_inside_block_comment_is_not_a_boundary():
    # the stripped comment leaves ONE space so surrounding text
    # cannot fuse into a new token across the seam
    out = split_statements("SELECT /* ; */ 1; SELECT 2;")
    assert out == ["SELECT   1", "SELECT 2"]


def test_escaped_quote_keeps_string_open():
    out = split_statements("SELECT 'it''s; fine'; SELECT 2")
    assert out == ["SELECT 'it''s; fine'", "SELECT 2"]

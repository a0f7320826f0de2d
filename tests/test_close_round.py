"""Locks for the close protocol's notes assembly: re-running the
close must REPLACE the generated Evidence block (never duplicate it)
and must preserve the hand-written prose above it."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.close_round import EVIDENCE_MARKER, replace_evidence_block


def test_fresh_notes_get_header():
    out = replace_evidence_block(None, EVIDENCE_MARKER + "\nnew", 12)
    assert out.startswith("# Round 12 notes\n\n")
    assert out.count(EVIDENCE_MARKER) == 1


def test_existing_block_is_replaced_not_duplicated():
    prior = (
        "# Round 12 notes\n\nprose stays\n\n"
        + EVIDENCE_MARKER + "\nold numbers\n\nEngine tree: `aaaa`"
    )
    out = replace_evidence_block(
        prior, EVIDENCE_MARKER + "\nnew numbers\n\nEngine tree: `bbbb`", 12
    )
    assert out.count(EVIDENCE_MARKER) == 1
    assert "prose stays" in out
    assert "old numbers" not in out and "new numbers" in out
    assert "`aaaa`" not in out and "`bbbb`" in out


def test_rerun_is_idempotent():
    block = EVIDENCE_MARKER + "\nsame\n"
    once = replace_evidence_block(None, block, 12)
    twice = replace_evidence_block(once, block, 12)
    assert once == twice

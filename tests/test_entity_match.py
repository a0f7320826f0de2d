"""Fuzzy entity resolution (blocked levenshtein record linkage):
brute-python cross-check of the match-pair set, plus the
oversized-block guard (a ubiquitous block key must be dropped, not
exploded into an O(n²) block)."""

from __future__ import annotations

import os

import pytest

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators.dedup import (
    ENTITY_BLOCK_MAX,
    ENTITY_LEV_MAX,
    customer_entity_match,
)


def _lev(a: str, b: str) -> int:
    """Classic DP edit distance (what Spark's levenshtein computes)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _brute_pairs(rows):
    """Replicate both blocking passes + the block guard in python."""
    recs = [(r.c_custkey, r.c_name.strip().lower()) for r in rows]
    out = set()
    for keyf in (lambda n: n[:-2], lambda n: n[:9] + n[-2:]):
        blocks = {}
        for ck, name in recs:
            blocks.setdefault(keyf(name), []).append((ck, name))
        for members in blocks.values():
            if len(members) > ENTITY_BLOCK_MAX:
                continue
            for i, (ka, na) in enumerate(members):
                for kb, nb in members[i + 1 :]:
                    lo, hi = min(ka, kb), max(ka, kb)
                    la, lb = (na, nb) if lo == ka else (nb, na)
                    d = _lev(la, lb)
                    if d <= ENTITY_LEV_MAX:
                        out.add((lo, hi, d))
    return out


def test_match_pairs_match_brute(spark, sf_dir):
    rows = load_table(spark, sf_dir, "customer").collect()
    want = _brute_pairs(rows)
    got_rows = customer_entity_match(spark, sf_dir).collect()
    got = {(r.custkey_a, r.custkey_b, r.lev_dist) for r in got_rows}
    assert got == want
    assert len(got_rows) == len(got)  # distinct: no pair twice
    # output ordering is deterministic
    assert [(r.custkey_a, r.custkey_b) for r in got_rows] == sorted(
        (r.custkey_a, r.custkey_b) for r in got_rows
    )
    # the fixture genuinely produces near-miss pairs
    assert want


def test_oversized_block_is_dropped(spark, tmp_path):
    """300 identical names share every block key: with the guard,
    they contribute ZERO pairs instead of 300*299/2."""
    import pandas as pd

    n = ENTITY_BLOCK_MAX + 44
    df = pd.DataFrame(
        {
            "c_custkey": list(range(n)) + [10_000, 10_001],
            "c_name": ["Customer#000000042"] * n
            + ["Zed#001", "Zed#002"],
            "c_nationkey": 0,
            "c_acctbal": 0.0,
            "c_mktsegment": "BUILDING",
        }
    )
    sf = str(tmp_path)
    df.to_parquet(os.path.join(sf, "customer.parquet"))
    got = customer_entity_match(spark, sf).collect()
    # the ubiquitous block is gone; only the two-row zed block pairs
    assert {(r.custkey_a, r.custkey_b, r.lev_dist) for r in got} == {
        (10_000, 10_001, 1)
    }

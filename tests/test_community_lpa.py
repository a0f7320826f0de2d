"""Synchronous LPA community detection: exact cross-check of
lpa_labels against a pure-python reference on generated graphs
(the determinism contract — mode vote with a total tie-break), plus
structural checks of the fixture-level query."""

from __future__ import annotations

from collections import Counter

from dbt_eamples_spark.operators.graph import (
    LPA_ROUNDS,
    graph_community_lpa,
    lpa_labels,
)


def _py_lpa(edges: set[tuple[int, int]], rounds: int) -> dict[int, int]:
    nodes = {s for s, _ in edges}
    nbrs: dict[int, list[int]] = {n: [] for n in nodes}
    for s, d in edges:
        nbrs[s].append(d)
    lbl = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            votes = Counter(lbl[d] for d in nbrs[n])
            # mode, ties by smallest label — a total order
            new[n] = min(votes, key=lambda l: (-votes[l], l))
        lbl = new
    return lbl


def _sym(pairs) -> set[tuple[int, int]]:
    out = set()
    for a, b in pairs:
        if a != b:
            out.add((a, b))
            out.add((b, a))
    return out


GRAPHS = {
    # two triangles joined by a bridge — the classic two-community case
    "two_triangles": _sym(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    ),
    # star: all leaves adopt the hub's label through the hub votes
    "star": _sym([(0, i) for i in range(1, 8)]),
    # ring of 8
    "ring": _sym([(i, (i + 1) % 8) for i in range(8)]),
    # deterministic pseudo-random graph (LCG, no RNG in tests)
    "lcg": _sym(
        [((s := (s0 * 1103515245 + 12345) % 97), (s * 31 + 7) % 23)
         for s0 in range(40)]
    ),
}


def test_lpa_matches_python_reference(spark):
    for name, edges in GRAPHS.items():
        df = spark.createDataFrame(
            sorted(edges), "src long, dst long"
        )
        got = {
            r.node: r.lbl for r in lpa_labels(df, LPA_ROUNDS).collect()
        }
        want = _py_lpa(edges, LPA_ROUNDS)
        assert got == want, f"graph {name}: {got} != {want}"


def test_fixture_communities_structural(spark, sf_dir):
    rows = graph_community_lpa(spark, sf_dir).collect()
    # every part that has a co-purchase edge appears exactly once
    keys = [r.l_partkey for r in rows]
    assert keys == sorted(set(keys))
    # community_size is consistent with the labeling itself
    sizes = Counter(r.community for r in rows)
    assert all(sizes[r.community] == r.community_size for r in rows)
    # labels are node ids — every community label is a real node
    assert {r.community for r in rows} <= set(keys)

"""Property test: the fixed-point PageRank is EXACTLY the integer
recurrence it claims — for arbitrary generated symmetric graphs,
every node's rank_fp equals a pure-python big-int reference bit for
bit (the cross-engine determinism contract, enforced rather than
asserted in prose)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_eamples_spark.operators.graph import (
    PAGERANK_DAMP_PCT,
    PAGERANK_SCALE,
    pagerank_fixed_point,
)


def _reference(edges: set[tuple[int, int]], iters: int) -> dict[int, int]:
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    n = len(deg)
    init = PAGERANK_SCALE // n
    base = (15 * PAGERANK_SCALE) // (100 * n)
    ranks = {v: init for v in deg}
    for _ in range(iters):
        share = {v: ranks[v] // deg[v] for v in deg}
        in_share: dict[int, int] = {}
        for s, d in edges:
            in_share[d] = in_share.get(d, 0) + share[s]
        ranks = {
            v: base + (PAGERANK_DAMP_PCT * in_share[v]) // 100 for v in deg
        }
    return ranks


@st.composite
def symmetric_graphs(draw):
    n = draw(st.integers(min_value=2, max_value=12))
    pairs = draw(
        st.sets(
            st.tuples(
                st.integers(0, n - 1), st.integers(0, n - 1)
            ).filter(lambda p: p[0] < p[1]),
            min_size=1,
            max_size=20,
        )
    )
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    return edges


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(symmetric_graphs(), st.integers(min_value=1, max_value=4))
def test_spark_matches_pure_python_bit_for_bit(spark, edges, iters):
    df = spark.createDataFrame(sorted(edges), ["src", "dst"])
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(df, iters=iters).collect()
    }
    want = _reference(edges, iters)
    assert got == want

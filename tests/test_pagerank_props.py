"""Property test: the fixed-point PageRank is EXACTLY the integer
recurrence it claims — for arbitrary generated symmetric graphs,
every node's rank_fp equals a pure-python big-int reference bit for
bit (the cross-engine determinism contract, enforced rather than
asserted in prose)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

from dbt_eamples_spark.operators.graph import (
    PAGERANK_DAMP_PCT,
    PAGERANK_SCALE,
    pagerank_fixed_point,
)

# slow lane (VERDICT r14 #2): bit-for-bit pagerank property sweep —
# excluded from the default run so `pytest tests/ -x -q` fits the
# driver's verify budget; the close ritual runs it via --runslow.
pytestmark = pytest.mark.slow


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


def _gather_by_src_reference(
    edges: set[tuple[int, int]], iters: int
) -> dict[int, int]:
    """The engine's literal recurrence on an ARBITRARY edge frame:
    node s gathers share(d) = rank(d) // out_deg(d) along its OUT
    edges (s, d). Under symmetry this equals the textbook form; on
    an asymmetric frame it equals neither forward nor reverse
    textbook PageRank (shares still divide by the ORIGINAL
    out-degree)."""
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
            in_share[s] = in_share.get(s, 0) + share[d]
        ranks = {
            v: base + (PAGERANK_DAMP_PCT * in_share.get(v, 0)) // 100
            for v in deg
        }
    return ranks


def test_asymmetric_input_diverges_from_textbook(spark):
    """ADVICE r7 guard: the engine gathers by joining the DST end
    and grouping by SRC — equivalent to textbook PageRank ONLY on a
    symmetric frame. This test pins the asymmetric behavior (engine
    == its literal gather-by-src recurrence, engine != the textbook
    forward form), so a caller wiring a one-directional edge list
    hits a documented contract, not a silent wrong answer."""
    edges = {(0, 1), (1, 2), (2, 0), (0, 2)}  # asymmetric: no (2,1) etc.
    # every node must appear as a source (engine derives nodes there)
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        r.node: r.rank_fp
        for r in pagerank_fixed_point(df, iters=2).collect()
    }
    assert got == _gather_by_src_reference(edges, iters=2)
    assert got != _reference(edges, iters=2), (
        "engine unexpectedly equals textbook forward PageRank on an "
        "asymmetric graph — if the gather direction changed, update "
        "the symmetry contract in pagerank_fixed_point's docstring"
    )

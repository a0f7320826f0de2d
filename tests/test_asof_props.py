"""Property-based check of the as-of join (hypothesis): on random
small key/time datasets, the union-and-scan implementation must
match a brute-force per-row reference (greatest right ts <= left ts
per key, ties broken by greatest tiebreak id, NULL when no match).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_eamples_spark.operators.asof import as_of_join

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # key
        st.integers(min_value=0, max_value=12),  # ts
    ),
    min_size=1,
    max_size=10,
)


def brute_force(left_rows, right_rows):
    out = {}
    for lid, (lk, lt) in enumerate(left_rows):
        best = None
        for rid, (rk, rt) in enumerate(right_rows):
            if rk == lk and rt <= lt:
                cand = (rt, rid)
                if best is None or cand > best:
                    best = cand
        out[lid] = None if best is None else best[1]
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(fact_rows=ROWS, n_salts=st.integers(min_value=1, max_value=5))
def test_salted_join_property(spark, fact_rows, n_salts):
    """salted_join(fact, dim) ≡ fact.join(dim) for any salt count."""
    from pyspark.sql import functions as F

    from dbt_eamples_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(fact_rows)],
        "fid long, k long, v long",
    )
    dim = spark.createDataFrame(
        [(k, k * 10) for k in {k for k, _ in fact_rows}],
        "k long, payload long",
    )
    plain = sorted(
        (r["fid"], r["payload"]) for r in fact.join(dim, "k").collect()
    )
    salted = sorted(
        (r["fid"], r["payload"])
        for r in salted_join(fact, dim, key="k", n_salts=n_salts).collect()
    )
    assert plain == salted


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left_rows=ROWS, right_rows=ROWS)
def test_asof_matches_brute_force(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        [(lid, k, t) for lid, (k, t) in enumerate(left_rows)],
        "lid long, k long, ts long",
    )
    right = spark.createDataFrame(
        [(rid, k, t) for rid, (k, t) in enumerate(right_rows)],
        "rid long, k long, ts long",
    )
    got = {
        r["lid"]: r["matched_rid"]
        for r in as_of_join(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="ts",
            payload={"rid": "matched_rid"},
            tiebreak="rid",
        ).collect()
    }
    assert got == brute_force(left_rows, right_rows)

"""Property test: the KMV sketch report is EXACTLY the md5
order-statistics computation it claims — for arbitrary generated
(group, key) sets, every output cell (exact, est, m, including the
``__all__`` merge row) equals a pure-python reference bit for bit."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_eamples_spark.operators.sampling import KMV_K, kmv_sketch_report

EST_NUM = float((KMV_K - 1) * (1 << 60))


def _h(key: int) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)


def _est(hk: int, m: int) -> int:
    return m if m < KMV_K else math.floor(EST_NUM / hk)


def _reference(pairs: set[tuple[str, int]]) -> dict[str, tuple[int, int, int]]:
    groups: dict[str, set[int]] = {}
    for g, k in pairs:
        groups.setdefault(g, set()).add(k)
    out = {}
    merged: set[tuple[int, int]] = set()
    for g, keys in groups.items():
        kept = sorted(((_h(k), k) for k in keys))[:KMV_K]
        merged.update(kept)
        hk, m = kept[-1][0], len(kept)
        out[g] = (len(keys), _est(hk, m), m)
    mk = sorted(merged)[:KMV_K]
    all_keys = {k for ks in groups.values() for k in ks}
    out["__all__"] = (len(all_keys), _est(mk[-1][0], len(mk)), len(mk))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.sets(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=200,
    )
)
def test_spark_matches_pure_python_bit_for_bit(spark, pairs):
    df = spark.createDataFrame(
        sorted(pairs), ["event_type", "user_id"]
    )
    got = {
        r["event_type"]: (r["exact"], r["est"], r["m"])
        for r in kmv_sketch_report(df).collect()
    }
    assert got == _reference(pairs)

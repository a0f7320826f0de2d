"""Properties of the behavioral-analytics operators: funnel
monotonicity against a Python replay of the state machine, retention
matrix invariants, and mode determinism."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators.behavior import (
    FUNNEL_STEPS,
    agg_mode_per_group,
    events_funnel,
    retention_cohort,
)


def _replay_funnel(events):
    """Pure-Python strictly-ordered funnel over (ts, event_id, type)
    rows for one user; returns how many steps were reached."""
    state = [None] * len(FUNNEL_STEPS)
    for ts, _eid, etype in sorted(events):
        for i, step in enumerate(FUNNEL_STEPS):
            if state[i] is None and etype == step and (
                i == 0 or (state[i - 1] is not None and ts > state[i - 1])
            ):
                state[i] = ts
                break
    return sum(1 for t in state if t is not None)


class TestFunnel:
    def test_matches_python_replay(self, spark, sf_dir):
        rows = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type").isin(*FUNNEL_STEPS))
            .select("user_id", "ts", "event_id", "event_type")
            .collect()
        )
        per_user: dict = {}
        for r in rows:
            per_user.setdefault(r.user_id, []).append(
                (r.ts, r.event_id, r.event_type)
            )
        expected = Counter()
        for evs in per_user.values():
            reached = _replay_funnel(evs)
            for step in range(1, reached + 1):
                expected[step] += 1
        out = {r.step_idx: r for r in events_funnel(spark, sf_dir).collect()}
        assert len(out) == len(FUNNEL_STEPS)
        for i in range(1, len(FUNNEL_STEPS) + 1):
            assert out[i].n_users == expected.get(i, 0)
        # monotone non-increasing and normalized to step 1
        counts = [out[i].n_users for i in range(1, len(FUNNEL_STEPS) + 1)]
        assert counts == sorted(counts, reverse=True)
        assert out[1].pct_of_first == 1.0


class TestRetention:
    def test_matrix_invariants(self, spark, sf_dir):
        rows = retention_cohort(spark, sf_dir).collect()
        assert rows
        by_cohort: dict = {}
        for r in rows:
            assert r.day_offset >= 0
            assert 0 < r.retention_pct <= 1.0
            by_cohort.setdefault(r.cohort_day, {})[r.day_offset] = r.n_users
        for offsets in by_cohort.values():
            # the cohort's day-0 row exists and is the maximum
            assert 0 in offsets
            assert offsets[0] == max(offsets.values())

    def test_user_partition(self, spark, sf_dir):
        # day-0 cohort sizes partition the user population
        total = sum(
            r.n_users
            for r in retention_cohort(spark, sf_dir).collect()
            if r.day_offset == 0
        )
        n_users = (
            load_table(spark, sf_dir, "events")
            .select("user_id")
            .distinct()
            .count()
        )
        assert total == n_users


class TestMode:
    def test_mode_matches_python(self, spark, sf_dir):
        rows = (
            load_table(spark, sf_dir, "events")
            .select("user_id", "event_type")
            .collect()
        )
        per_user: dict = {}
        for r in rows:
            per_user.setdefault(r.user_id, Counter())[r.event_type] += 1
        out = agg_mode_per_group(spark, sf_dir).collect()
        assert len(out) == len(per_user)
        for r in out:
            c = per_user[r.user_id]
            # deterministic tie-break: max count, then lexicographic
            best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            assert (r.mode_event, r.n_events) == best
            assert r.total_events == sum(c.values())

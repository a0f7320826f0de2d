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


class TestTransitions:
    def test_matrix_matches_python(self, spark, sf_dir):
        from dbt_eamples_spark.operators.behavior import (
            events_transition_matrix,
        )

        rows = (
            load_table(spark, sf_dir, "events")
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
            seq = [t for _, _, t in sorted(evs)]
            for a, b in zip(seq, seq[1:]):
                expected[(a, b)] += 1
        out = events_transition_matrix(spark, sf_dir).collect()
        got = {(r.prev_type, r.next_type): r.n_transitions for r in out}
        assert got == dict(expected)
        assert abs(sum(r.share for r in out) - 1.0) < 1e-4


class TestZscore:
    def test_outliers_match_python(self, spark, sf_dir):
        import statistics

        from dbt_eamples_spark.operators.quality import (
            Z_THRESHOLD,
            agg_zscore_outliers,
        )

        rows = (
            load_table(spark, sf_dir, "events")
            .select("event_id", "event_type", "value")
            .collect()
        )
        by_type: dict = {}
        for r in rows:
            by_type.setdefault(r.event_type, []).append(
                (r.event_id, round(r.value * 100))
            )
        expected = set()
        for _etype, vals in by_type.items():
            cents = [c for _, c in vals]
            mu = statistics.mean(cents)
            sd = statistics.stdev(cents)
            for eid, c in vals:
                if abs(round((c - mu) / sd, 4)) > Z_THRESHOLD:
                    expected.add(eid)
        got = {r.event_id for r in agg_zscore_outliers(spark, sf_dir).collect()}
        assert got == expected


class TestEntropy:
    def test_entropy_matches_python(self, spark, sf_dir):
        import math

        from dbt_eamples_spark.operators.text import text_word_entropy

        docs = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .collect()
        )
        out = {r.doc_id: r for r in text_word_entropy(spark, sf_dir).collect()}
        assert len(out) == len(docs)
        import re

        for d in docs[:50]:
            toks = re.split(r"\s+", d.text.lower())
            n = len(toks)
            c = Counter(toks)
            ent = sum(
                round(-(tf / n) * round(math.log(tf / n), 6) * 1e9)
                for tf in c.values()
            ) / 1e9
            r = out[d.doc_id]
            assert r.n_tokens == n
            assert r.n_distinct_tokens == len(c)
            assert abs(r.entropy - round(ent, 6)) < 1e-9
            # entropy bounded by ln(distinct)
            assert r.entropy <= math.log(len(c)) + 1e-6

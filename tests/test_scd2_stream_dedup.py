"""SCD2 snapshot invariants + streaming-dedup batch equivalence."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from dbt_eamples_spark.streaming.incremental import scd2_snapshot
from dbt_eamples_spark.streaming.streams import (
    stream_dedup,
    stream_dedup_streaming,
)


class TestScd2Snapshot:
    def test_intervals_tile_without_gaps_or_overlap(self, spark, sf_dir):
        rows = scd2_snapshot(spark, sf_dir).collect()
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        for user, versions in by_user.items():
            versions.sort(key=lambda r: r.valid_from)
            currents = [v for v in versions if v.is_current]
            assert len(currents) == 1
            assert versions[-1].is_current and versions[-1].valid_to is None
            for prev, nxt in zip(versions, versions[1:]):
                # each version closes exactly where the next opens
                assert prev.valid_to == nxt.valid_from
                # check strategy: consecutive versions differ
                assert prev.value != nxt.value

    def test_versions_match_python_replay(self, spark, sf_dir):
        # replay through load_table for the nanos-safe read
        from dbt_eamples_spark.catalog import load_table

        ev = (
            load_table(spark, sf_dir, "events")
            .select("user_id", "event_id", "ts", "value")
            .collect()
        )
        expected: dict[int, list] = {}
        for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
            hist = expected.setdefault(r.user_id, [])
            if not hist or hist[-1] != r.value:
                hist.append(r.value)
        got: dict[int, list] = {}
        for r in sorted(
            scd2_snapshot(spark, sf_dir).collect(),
            key=lambda r: (r.user_id, r.valid_from),
        ):
            got.setdefault(r.user_id, []).append(r.value)
        assert got == expected


class TestStreamDedup:
    def test_streaming_key_set_equals_batch(self, spark, sf_dir, tmp_path):
        name = f"dedup_{uuid.uuid4().hex[:8]}"
        stream_dedup_streaming(
            spark, sf_dir, checkpoint=str(tmp_path / "ckpt_d"), out_table=name
        )
        streamed_keys = spark.sql(
            f"SELECT DISTINCT user_id, event_type, value FROM {name}"
        )
        batch_keys = stream_dedup(spark, sf_dir).select(
            "user_id", "event_type", "value"
        )
        diff = (
            streamed_keys.exceptAll(batch_keys).count()
            + batch_keys.exceptAll(streamed_keys).count()
        )
        assert diff == 0
        # streaming emits exactly one row per key (dedup actually dropped)
        assert (
            spark.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()[0].n
            == batch_keys.count()
        )

    def test_batch_counts_cover_all_events(self, spark, sf_dir):
        out = stream_dedup(spark, sf_dir)
        from dbt_eamples_spark.catalog import load_table

        total = load_table(spark, sf_dir, "events").count()
        assert out.agg(F.sum("n_dups")).collect()[0][0] == total


class TestStreamIncrementalAppend:
    def test_append_is_idempotent_across_reruns(self, spark, sf_dir, tmp_path):
        from dbt_eamples_spark.catalog import load_table
        from dbt_eamples_spark.streaming.streams import (
            stream_incremental_append,
        )

        sink = str(tmp_path / "sink")
        stream_incremental_append(
            spark, sf_dir, checkpoint=str(tmp_path / "c1"), sink_path=sink
        )
        total = load_table(spark, sf_dir, "events").count()
        first = spark.read.parquet(sink)
        assert first.count() == total
        assert "insert_dt" in first.columns
        # rerun with a FRESH checkpoint (simulating a cron retry that
        # lost its offsets): the anti-join must append nothing
        stream_incremental_append(
            spark, sf_dir, checkpoint=str(tmp_path / "c2"), sink_path=sink
        )
        again = spark.read.parquet(sink)
        assert again.count() == total
        assert again.select("event_id").distinct().count() == total


class TestStreamIntervalJoin:
    def test_streaming_pairs_equal_batch(self, spark, sf_dir, tmp_path):
        from dbt_eamples_spark.streaming.streams import (
            stream_interval_join,
            stream_interval_join_streaming,
        )

        name = f"pairs_{uuid.uuid4().hex[:8]}"
        stream_interval_join_streaming(
            spark, sf_dir, checkpoint=str(tmp_path / "ckpt_j"), out_table=name
        )
        streamed = spark.sql(
            f"SELECT user_id, click_id, purchase_id, lag_s FROM {name}"
        )
        batch = stream_interval_join(spark, sf_dir)
        diff = (
            streamed.exceptAll(batch).count()
            + batch.exceptAll(streamed).count()
        )
        assert diff == 0
        assert batch.count() > 0  # the fixture does produce pairs


class TestAppendGuardStrictness:
    def test_non_missing_path_read_error_propagates(self, spark, sf_dir):
        """Only the missing-sink AnalysisException may skip the
        anti-join guard; any other sink-read failure must fail the
        increment (silently appending without the guard is the exact
        duplication idempotent_append exists to prevent)."""
        import pytest

        from dbt_eamples_spark.catalog import load_table
        from dbt_eamples_spark.streaming.incremental import idempotent_append

        class _BrokenRead:
            def parquet(self, _path):
                raise RuntimeError("transient FS failure")

        class _BrokenSpark:
            read = _BrokenRead()

        delta = load_table(spark, sf_dir, "events").limit(5)
        with pytest.raises(RuntimeError, match="transient FS failure"):
            idempotent_append(
                _BrokenSpark(), delta, "/nonexistent/sink", key="event_id"
            )

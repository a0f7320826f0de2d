"""Round-4 second-batch operators: literal-data semantics tests
(the driver's DuckDB oracle covers fixture-scale equivalence; these
pin exact behaviors — diff statuses, weighted-threshold picks,
microsecond gap arithmetic — on hand-built rows)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from dbt_eamples_spark.operators.behavior import events_inter_arrival
from dbt_eamples_spark.operators.relational import agg_weighted_percentile
from dbt_eamples_spark.streaming.incremental import table_diff


def _write(spark, tmp_path, name, rows, schema):
    df = spark.createDataFrame(rows, schema=schema)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )
    return str(tmp_path)


_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_totalprice", T.DoubleType()),
    ]
)


class TestTableDiff:
    def test_statuses_and_unchanged_excluded(self, spark, tmp_path):
        # keys 1..10: key 7 missing from old (added), key 10 missing
        # from new (removed), keys 3/6/9 restated +1.00 (changed),
        # everything else identical and therefore ABSENT from output
        rows = [(k, 100.0 + k) for k in range(1, 11)]
        sf = _write(spark, tmp_path, "orders", rows, _ORDERS_SCHEMA)
        out = {r["o_orderkey"]: r for r in table_diff(spark, sf).collect()}
        assert set(out) == {3, 6, 7, 9, 10}
        assert out[7]["status"] == "added"
        assert out[7]["old_cents"] is None
        assert out[7]["new_cents"] == 10700
        assert out[10]["status"] == "removed"
        assert out[10]["new_cents"] is None
        for k in (3, 6, 9):
            assert out[k]["status"] == "changed"
            assert out[k]["new_cents"] - out[k]["old_cents"] == 100

    def test_identical_snapshots_diff_only_fixture_masks(self, spark, tmp_path):
        # keys divisible by neither 7 nor 10 nor 3 never appear
        rows = [(k, 50.0) for k in (1, 2, 4, 5, 8, 11, 13)]
        sf = _write(spark, tmp_path, "orders", rows, _ORDERS_SCHEMA)
        assert table_diff(spark, sf).count() == 0


_LINEITEM_SCHEMA = T.StructType(
    [
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_quantity", T.DoubleType()),
    ]
)


class TestWeightedPercentile:
    def test_threshold_semantics(self, spark, tmp_path):
        # group A: values 1.00/2.00/3.00 with weights 1/1/6 → total 8;
        # p25 threshold 2 → cum(1.00)=1 <2, cum(2.00)=2 → 2.00;
        # p50 threshold 4 → first reached at 3.00; p75 likewise 3.00
        rows = [
            ("A", 1.00, 1.0),
            ("A", 2.00, 1.0),
            ("A", 3.00, 6.0),
        ]
        sf = _write(spark, tmp_path, "lineitem", rows, _LINEITEM_SCHEMA)
        out = agg_weighted_percentile(spark, sf).collect()
        assert len(out) == 1
        r = out[0]
        assert r["total_weight"] == 8
        assert r["p25_cents"] == 200
        assert r["p50_cents"] == 300
        assert r["p75_cents"] == 300

    def test_duplicate_prices_pool_weight(self, spark, tmp_path):
        # the same price on two rows pools its weight BEFORE the
        # cumulative pass (order among equal prices cannot matter)
        rows = [
            ("B", 5.00, 3.0),
            ("B", 5.00, 3.0),
            ("B", 9.00, 4.0),
        ]
        sf = _write(spark, tmp_path, "lineitem", rows, _LINEITEM_SCHEMA)
        r = agg_weighted_percentile(spark, sf).collect()[0]
        # total 10: p50 threshold 5 → cum(500)=6 ≥ 5 → 500
        assert r["p50_cents"] == 500
        assert r["p75_cents"] == 900


_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _ts(sec: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


class TestInterArrival:
    def test_microsecond_gaps_and_median(self, spark, tmp_path):
        # user 1: events at 0s, 1.5s, 4.5s → gaps 1_500_000 and
        # 3_000_000 us; median interpolates to 2_250_000.0
        rows = [
            (1, _ts(0.0), 1, "click", 0.0, None),
            (2, _ts(1.5), 1, "click", 0.0, None),
            (3, _ts(4.5), 1, "click", 0.0, None),
            # user 2: a single event yields NO gap row
            (4, _ts(0.0), 2, "view", 0.0, None),
        ]
        sf = _write(spark, tmp_path, "events", rows, _EVENTS_SCHEMA)
        out = {r["user_id"]: r for r in events_inter_arrival(spark, sf).collect()}
        assert set(out) == {1}
        r = out[1]
        assert r["n_gaps"] == 2
        assert r["min_gap_us"] == 1_500_000
        assert r["max_gap_us"] == 3_000_000
        assert r["total_gap_us"] == 4_500_000
        assert r["p50_gap_us"] == 2_250_000.0

    def test_ties_break_by_event_id(self, spark, tmp_path):
        # two events at the SAME ts: order is (ts, event_id), so the
        # gap sequence is 0 then 2s — deterministic either way the
        # rows arrive
        rows = [
            (10, _ts(5.0), 3, "click", 0.0, None),
            (11, _ts(5.0), 3, "click", 0.0, None),
            (12, _ts(7.0), 3, "click", 0.0, None),
        ]
        sf = _write(spark, tmp_path, "events", rows, _EVENTS_SCHEMA)
        r = events_inter_arrival(spark, sf).collect()[0]
        assert r["n_gaps"] == 2
        assert r["min_gap_us"] == 0
        assert r["max_gap_us"] == 2_000_000


class TestSkewnessKurtosis:
    def test_known_moments(self, spark, tmp_path):
        # group A: [1,2,3] — symmetric: skew 0, excess kurt −1.5
        # group B: [1,1,1,5] — μ=2, m2=3, m3=6, m4=21:
        #   skew = 6/(3·√3) = 2/√3 ≈ 1.154701, kurt = 21/9 − 3
        rows = [("A", 0.0, 1.0), ("A", 0.0, 2.0), ("A", 0.0, 3.0)] + [
            ("B", 0.0, q) for q in (1.0, 1.0, 1.0, 5.0)
        ]
        sf = _write(
            spark,
            tmp_path,
            "lineitem",
            rows,
            T.StructType(
                [
                    T.StructField("l_returnflag", T.StringType()),
                    T.StructField("l_extendedprice", T.DoubleType()),
                    T.StructField("l_quantity", T.DoubleType()),
                ]
            ),
        )
        from dbt_eamples_spark.operators.relational import agg_skewness_kurtosis

        out = {r["l_returnflag"]: r for r in agg_skewness_kurtosis(spark, sf).collect()}
        assert out["A"]["skewness"] == 0.0
        assert out["A"]["kurtosis_excess"] == -1.5
        assert abs(out["B"]["skewness"] - 1.154701) < 1e-6
        assert abs(out["B"]["kurtosis_excess"] - (-0.666667)) < 1e-6
        assert out["B"]["mean_qty"] == 2.0


class TestLateDataMetrics:
    def test_partition_of_corpus_and_late_path_exercised(self, spark):
        from dbt_eamples_spark.streaming.streams import stream_late_data_metrics

        sf = "/root/testdata/sf0.001"
        rows = stream_late_data_metrics(spark, sf).collect()
        total = sum(r["n_on_time"] + r["n_late_dropped"] for r in rows)
        from dbt_eamples_spark.catalog import load_table

        assert total == load_table(spark, sf, "events").count()
        # the jittered arrival model must actually exercise BOTH
        # branches (without jitter the fixture has zero late rows)
        assert sum(r["n_late_dropped"] for r in rows) > 0
        assert sum(r["n_on_time"] for r in rows) > 0


class TestKnnGraph:
    def test_matches_numpy_mutual_topk(self, spark):
        import numpy as np

        from dbt_eamples_spark.catalog import load_table
        from dbt_eamples_spark.operators.similarity import (
            KNN_GRAPH_K,
            KNN_GRAPH_N,
            similarity_knn_graph,
        )

        sf = "/root/testdata/sf0.001"
        emb = (
            load_table(spark, sf, "embeddings")
            .filter(f"vec_id < {KNN_GRAPH_N}")
            .select("vec_id", "embedding")
            .collect()
        )
        ids = np.array([r["vec_id"] for r in emb])
        X = np.array([r["embedding"] for r in emb], dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = Xn @ Xn.T
        np.fill_diagonal(S, -2.0)
        want = set()
        topk = {}
        for i in range(len(ids)):
            # cosine DESC, neighbor_id ASC tie order, rounded to 6dp
            # like the operator so borderline ties agree
            order = sorted(
                range(len(ids)),
                key=lambda j: (-round(S[i, j], 6), ids[j]),
            )[:KNN_GRAPH_K]
            topk[ids[i]] = {ids[j] for j in order}
        for a in topk:
            for b in topk[a]:
                if a < b and a in topk.get(b, set()):
                    want.add((a, b))
        got = {
            (r["a"], r["b"]) for r in similarity_knn_graph(spark, sf).collect()
        }
        assert got == want
        assert got  # non-degenerate: the fixture yields real edges

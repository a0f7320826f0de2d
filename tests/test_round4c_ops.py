"""Semantic tests for the round-4 second-wave operators: OHLC
resampling, the TPC-H Q12/Q5 shapes, CMS heavy hitters, fixed-size
hash sampling, canonicalization dedup, and fixed-point PageRank."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.operators.behavior import ts_resample_ohlc
from dbt_eamples_spark.operators.dedup import text_normalize_dedup
from dbt_eamples_spark.operators.graph import (
    PAGERANK_SCALE,
    PAGERANK_TOP_K,
    graph_pagerank_topk,
)
from dbt_eamples_spark.operators.relational import (
    DELAY_BANDS,
    DELAY_TAIL,
    agg_ship_delay_bands,
    join_star_local_volume,
)
from dbt_eamples_spark.operators.sampling import (
    CMS_TOP_K,
    FIXED_SAMPLE_K,
    agg_heavy_hitters_cms,
    sample_fixed_size_hash,
)


class TestOhlc:
    def test_bar_invariants_and_total_volume(self, spark, sf_dir):
        bars = ts_resample_ohlc(spark, sf_dir).collect()
        assert bars
        for b in bars:
            assert b["low"] <= min(b["open"], b["close"])
            assert b["high"] >= max(b["open"], b["close"])
            assert b["n_events"] >= 1
        total = sum(b["n_events"] for b in bars)
        assert total == load_table(spark, sf_dir, "events").count()

    def test_single_event_hour_collapses(self, spark, sf_dir):
        one = [
            b
            for b in ts_resample_ohlc(spark, sf_dir).collect()
            if b["n_events"] == 1
        ]
        assert one  # fixture has sparse hours
        for b in one:
            assert b["open"] == b["high"] == b["low"] == b["close"]


class TestShipDelayBands:
    def test_partition_of_fact_table(self, spark, sf_dir):
        rows = agg_ship_delay_bands(spark, sf_dir).collect()
        names = {n for _, n in DELAY_BANDS} | {DELAY_TAIL}
        assert {r["delay_band"] for r in rows} <= names
        assert sum(r["n_lines"] for r in rows) == load_table(
            spark, sf_dir, "lineitem"
        ).count()


class TestLocalVolume:
    def test_revenue_matches_unrestricted_recompute(self, spark, sf_dir):
        """Cross-check one nation's revenue against an independent
        python-side recompute over the collected joined slice."""
        out = {
            r["n_name"]: r["revenue_cents"]
            for r in join_star_local_volume(spark, sf_dir).collect()
        }
        assert out and all(v > 0 for v in out.values())
        # recompute the same measure with a different plan: SQL join
        from dbt_eamples_spark.catalog import register_tables

        register_tables(spark, sf_dir)
        twin = {
            r["n_name"]: r["rc"]
            for r in spark.sql(
                """
                SELECT n_name,
                       SUM(CAST(round(l_extendedprice * (1 - l_discount)
                           * 100) AS BIGINT)) AS rc
                FROM lineitem, orders, customer, supplier, nation, region
                WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
                  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  AND s_nationkey = n_nationkey
                  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
                  AND o_orderdate BETWEEN '1995-01-01' AND '1996-12-31'
                GROUP BY n_name
                """
            ).collect()
        }
        assert out == twin


class TestCmsHeavyHitters:
    def test_one_sided_error_and_true_top1(self, spark, sf_dir):
        rows = agg_heavy_hitters_cms(spark, sf_dir).collect()
        n_users = (
            load_table(spark, sf_dir, "events")
            .select("user_id")
            .distinct()
            .count()
        )
        assert len(rows) == min(CMS_TOP_K, n_users)
        for r in rows:
            assert r["overcount"] >= 0  # CMS never undercounts
            assert r["est"] == r["exact"] + r["overcount"]
        true_max = (
            load_table(spark, sf_dir, "events")
            .groupBy("user_id")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )
        # the true heaviest key's estimate is >= its exact count, and
        # the reported top estimate is at least the true max
        assert rows[0]["est"] >= true_max


class TestFixedSizeSample:
    def test_exactly_k_and_reproducible(self, spark, sf_dir):
        a = sample_fixed_size_hash(spark, sf_dir).collect()
        b = sample_fixed_size_hash(spark, sf_dir).collect()
        assert len(a) == min(
            FIXED_SAMPLE_K,
            load_table(spark, sf_dir, "documents").count(),
        )
        assert a == b  # same corpus -> same sample, run to run
        hs = [r["h"] for r in a]
        assert hs == sorted(hs)


class TestNormalizeDedup:
    def test_partition_and_casefold_merge(self, spark, sf_dir):
        rows = text_normalize_dedup(spark, sf_dir).collect()
        docs = load_table(spark, sf_dir, "documents")
        assert sum(r["n_members"] for r in rows) == docs.count()
        for r in rows:
            assert 1 <= r["n_distinct_raw"] <= r["n_members"]
        # the canonical form is insensitive to case/punct/whitespace:
        # recompute fingerprints for a mangled copy of the corpus and
        # assert identical group structure
        mangled = docs.select(
            "doc_id",
            F.upper(
                F.regexp_replace(F.col("text"), r" ", "   ")
            ).alias("text"),
        )
        canon = F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(F.col("text")), r"[^a-z0-9 ]", ""
                ),
                r" +",
                " ",
            )
        )
        orig = {
            r["doc_id"]: r["fp"]
            for r in docs.select(
                "doc_id", F.md5(canon).alias("fp")
            ).collect()
        }
        mang = {
            r["doc_id"]: r["fp"]
            for r in mangled.select(
                "doc_id", F.md5(canon).alias("fp")
            ).collect()
        }
        assert orig == mang


class TestPagerank:
    def test_mass_conservation_and_order(self, spark, sf_dir):
        rows = graph_pagerank_topk(spark, sf_dir).collect()
        assert 0 < len(rows) <= PAGERANK_TOP_K
        ranks = [r["rank_fp"] for r in rows]
        assert ranks == sorted(ranks, reverse=True)
        # fixed-point floor-division only ever LOSES mass, never
        # creates it; the top-k alone must stay under total mass and
        # every rank must exceed the teleport floor
        assert sum(ranks) <= PAGERANK_SCALE
        assert all(r > 0 for r in ranks)

    def test_high_degree_nodes_rank_high(self, spark, sf_dir):
        """On a near-regular co-purchase graph PageRank correlates
        with degree: the top-ranked node's degree is above the
        median degree of the returned slice."""
        rows = graph_pagerank_topk(spark, sf_dir).collect()
        degs = sorted(r["deg"] for r in rows)
        assert rows[0]["deg"] >= degs[len(degs) // 2]


class TestZipfSlope:
    def test_fit_matches_numpy_lstsq(self, spark, sf_dir):
        import numpy as np

        from dbt_eamples_spark.operators.text import text_zipf_slope

        row = text_zipf_slope(spark, sf_dir).collect()[0]
        # independent recompute: collect token frequencies and fit
        # with numpy polyfit on the same pre-rounded lns
        docs = load_table(spark, sf_dir, "documents").collect()
        from collections import Counter

        c = Counter()
        for r in docs:
            c.update(r["text"].lower().split())
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
        x = np.array(
            [round(np.log(i + 1), 6) for i in range(len(top))]
        )
        y = np.array([round(np.log(f), 6) for _, f in top])
        slope, intercept = np.polyfit(x, y, 1)
        assert row["n_terms"] == len(top)
        assert abs(row["zipf_slope"] - slope) < 1e-4
        assert abs(row["zipf_intercept"] - intercept) < 1e-3


class TestMixEntropy:
    def test_entropy_bounds_and_doc_totals(self, spark, sf_dir):
        from dbt_eamples_spark.operators.text import corpus_mix_entropy

        rows = corpus_mix_entropy(spark, sf_dir).collect()
        assert rows
        docs = load_table(spark, sf_dir, "documents")
        assert sum(r["n_docs"] for r in rows) == docs.count()
        import math

        for r in rows:
            assert 0.0 <= r["source_entropy"] <= math.log(r["n_sources"]) + 1e-6
            assert 0.0 <= r["norm_entropy"] <= 1.0 + 1e-6


class TestSourceFreshness:
    def test_verdicts_and_exact_hours(self, spark, sf_dir):
        import datetime as dt

        from dbt_eamples_spark.operators.quality import (
            FRESHNESS_AS_OF,
            FRESHNESS_ERROR_H,
            FRESHNESS_SOURCES,
            FRESHNESS_WARN_H,
            dq_source_freshness,
        )

        rows = {
            r["source_name"]: r
            for r in dq_source_freshness(spark, sf_dir).collect()
        }
        assert set(rows) == {n for n, _, _ in FRESHNESS_SOURCES}
        as_of = dt.datetime.strptime(FRESHNESS_AS_OF, "%Y-%m-%d %H:%M:%S")
        for name, r in rows.items():
            mx = dt.datetime.strptime(r["max_loaded_at"], "%Y-%m-%d %H:%M:%S")
            want_h = int((as_of - mx).total_seconds()) // 3600
            assert r["staleness_hours"] == want_h
            want_status = (
                "error"
                if want_h >= FRESHNESS_ERROR_H
                else "warn" if want_h >= FRESHNESS_WARN_H else "fresh"
            )
            assert r["status"] == want_status
        # the fixture exercises both ends of the verdict scale
        assert {r["status"] for r in rows.values()} >= {"fresh", "error"}


class TestPercentRankCume:
    def test_rank_ratios_per_segment(self, spark, sf_dir):
        from collections import defaultdict

        from dbt_eamples_spark.operators.relational import (
            window_percent_rank_cume,
        )

        rows = window_percent_rank_cume(spark, sf_dir).collect()
        by_seg = defaultdict(list)
        for r in rows:
            by_seg[r["mktsegment"]].append(r)
        docs = load_table(spark, sf_dir, "customer")
        assert len(rows) == docs.count()
        for seg, rs in by_seg.items():
            rs.sort(key=lambda r: (r["acctbal"], r["c_custkey"]))
            n = len(rs)
            for i, r in enumerate(rs):
                want_pr = 0.0 if n == 1 else i / (n - 1)
                assert abs(r["pct_rank"] - round(want_pr, 6)) < 1e-9
                assert abs(r["cume"] - round((i + 1) / n, 6)) < 1e-9


class TestKmvDistinct:
    def test_estimate_error_and_merge_row(self, spark, sf_dir):
        from dbt_eamples_spark.operators.sampling import (
            KMV_K,
            agg_kmv_distinct,
        )

        rows = {r["event_type"]: r for r in agg_kmv_distinct(spark, sf_dir).collect()}
        assert "__all__" in rows
        for t, r in rows.items():
            assert r["m"] <= KMV_K
            if r["m"] < KMV_K:
                # sketch not full -> exact by construction
                assert r["est"] == r["exact"] == r["m"]
            else:
                # standard KMV relative error ~ 1/sqrt(K) ≈ 12.5%;
                # allow 4 sigma
                assert abs(r["est"] - r["exact"]) <= r["exact"] * 0.5
        # merged estimate equals the estimate of the union domain:
        # every user appears in some type, so __all__ audits the
        # global distinct count
        assert rows["__all__"]["exact"] == max(
            r["exact"] for r in rows.values()
        )


class TestMicrobatch:
    def test_batches_partition_and_retry_is_idempotent(
        self, spark, sf_dir, tmp_path
    ):
        from dbt_eamples_spark.streaming.incremental import run_microbatch

        ev = load_table(spark, sf_dir, "events")
        sink = str(tmp_path / "mb")
        report = run_microbatch(spark, ev, sink)
        assert sum(r["rows"] for r in report) == ev.count()
        keys = [r["batch_key"] for r in report]
        assert keys == sorted(keys) and len(set(keys)) == len(keys)
        first = spark.read.parquet(sink)
        n_first = first.count()
        assert n_first == ev.count()

        # retry ONE batch (batch_keys selects exactly the named
        # batch; begin=k alone would replay k AND every later batch):
        # partition overwritten in place, nothing else touched,
        # total unchanged (idempotent backfill)
        k = keys[len(keys) // 2]
        report2 = run_microbatch(spark, ev, sink, batch_keys=[k])
        assert [r["batch_key"] for r in report2] == [k]
        again = spark.read.parquet(sink)
        assert again.count() == n_first
        # per-partition row counts identical to the event log's
        # Spark infers the partition column back as DATE — stringify
        per = {
            str(r["batch_key"]): r["n"]
            for r in again.groupBy("batch_key")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        want = {
            r["batch_key"]: r["n"]
            for r in ev.select(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                    "batch_key"
                )
            )
            .groupBy("batch_key")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert per == want

    def test_bounded_backfill_window(self, spark, sf_dir, tmp_path):
        from dbt_eamples_spark.streaming.incremental import run_microbatch

        ev = load_table(spark, sf_dir, "events")
        sink = str(tmp_path / "mb2")
        report = run_microbatch(
            spark, ev, sink, begin="2024-01-05", end="2024-01-08"
        )
        keys = {r["batch_key"] for r in report}
        assert keys == {"2024-01-05", "2024-01-06", "2024-01-07"}


class TestMarketShare:
    def test_share_bounds_and_conditional_sum(self, spark, sf_dir):
        from dbt_eamples_spark.operators.relational import agg_market_share

        rows = agg_market_share(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0 <= r["nation_cents"] <= r["total_cents"]
            assert 0.0 <= r["mkt_share"] <= 1.0
            assert (
                abs(r["mkt_share"] - r["nation_cents"] / r["total_cents"])
                < 1e-6
            )


class TestEventTypePmi:
    def test_pmi_identity_on_counts(self, spark, sf_dir):
        import math

        from dbt_eamples_spark.operators.behavior import events_type_pmi

        rows = events_type_pmi(spark, sf_dir).collect()
        assert rows
        ev = load_table(spark, sf_dir, "events").select(
            "user_id",
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            "event_type",
        ).distinct().collect()
        entities = {(r["user_id"], r["day"]) for r in ev}
        per_type = {}
        per_entity = {}
        for r in ev:
            per_type.setdefault(r["event_type"], set()).add(
                (r["user_id"], r["day"])
            )
            per_entity.setdefault((r["user_id"], r["day"]), set()).add(
                r["event_type"]
            )
        n = len(entities)
        for r in rows:
            a, b = r["type_a"], r["type_b"]
            n_ab = len(per_type[a] & per_type[b])
            assert r["n_ab"] == n_ab
            assert r["n_a"] == len(per_type[a])
            assert r["n_b"] == len(per_type[b])
            want = math.log((n_ab * n) / (r["n_a"] * r["n_b"]))
            assert abs(r["pmi"] - want) < 1e-5
        # association structure is non-degenerate at the day grain
        assert any(abs(r["pmi"]) > 1e-3 for r in rows)


class TestTimeToConvert:
    def test_latency_against_python_recompute(self, spark, sf_dir):
        from dbt_eamples_spark.operators.behavior import (
            events_time_to_convert,
        )

        row = events_time_to_convert(spark, sf_dir).collect()[0]
        ev = load_table(spark, sf_dir, "events").collect()
        views, buys = {}, {}
        for r in ev:
            us = int(r["ts"].timestamp() * 1_000_000)
            if r["event_type"] == "view":
                views[r["user_id"]] = min(
                    views.get(r["user_id"], us), us
                )
            elif r["event_type"] == "purchase":
                buys.setdefault(r["user_id"], []).append(us)
        lats = []
        for uid, fv in views.items():
            after = [b for b in buys.get(uid, ()) if b >= fv]
            if after:
                lats.append(min(after) - fv)
        assert row["n_viewed"] == len(views)
        assert row["n_converted"] == len(lats)
        assert row["min_us"] == min(lats)
        assert row["max_us"] == max(lats)
        assert row["min_us"] <= row["p50_us"] <= row["p90_us"] <= row["max_us"]


class TestGini:
    def test_matches_numpy_formula_and_bounds(self, spark, sf_dir):
        import numpy as np

        from dbt_eamples_spark.operators.behavior import agg_gini_revenue

        row = agg_gini_revenue(spark, sf_dir).collect()[0]
        li = load_table(spark, sf_dir, "lineitem").collect()
        import math

        rev = {}
        for r in li:
            # Spark round() is HALF-UP; Python round() is banker's —
            # floor(x+0.5) reproduces half-up for positive cents
            c = math.floor(
                r["l_extendedprice"] * (1 - r["l_discount"]) * 100 + 0.5
            )
            rev[r["l_partkey"]] = rev.get(r["l_partkey"], 0) + int(c)
        x = np.array(sorted(rev.values()), dtype=np.float64)
        n = len(x)
        want = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (
            n + 1
        ) / n
        assert row["n"] == n
        assert row["total_cents"] == int(x.sum())
        assert abs(row["gini"] - want) < 1e-6
        assert 0.0 <= row["gini"] < 1.0


class TestDqAdvanced:
    def test_report_shape_and_scd2_validity(self, spark, sf_dir):
        from dbt_eamples_spark.operators.quality import dq_advanced_tests

        rows = {r["test_name"]: r for r in dq_advanced_tests(spark, sf_dir).collect()}
        assert len(rows) == 4
        for r in rows.values():
            assert r["passed"] == (r["n_violations"] == 0)
        # scd2 validity intervals are non-overlapping by construction
        assert rows["mutually_exclusive_ranges_scd2_validity"]["passed"]
        # orders < lineitem rows always holds on TPC-H-shaped data
        assert rows["fewer_rows_than_orders_lt_lineitem"]["passed"]


class TestLangConfusion:
    def test_matrix_totals_and_recall_diagonal(self, spark, sf_dir):
        from dbt_eamples_spark.operators.text import text_lang_confusion

        rows = text_lang_confusion(spark, sf_dir).collect()
        docs = load_table(spark, sf_dir, "documents")
        assert sum(r["n_docs"] for r in rows) == docs.count()
        from collections import defaultdict

        per_actual = defaultdict(int)
        for r in rows:
            per_actual[r["actual"]] += r["n_docs"]
        for r in rows:
            assert (
                abs(
                    r["row_share"]
                    - round(r["n_docs"] / per_actual[r["actual"]], 6)
                )
                < 1e-9
            )


class TestCliTestAndFreshness:
    def test_cli_test_exit_reflects_failures(self, spark, sf_dir, capsys):
        from dbt_eamples_spark import cli

        rc = cli.main(["test", "--sf-dir", sf_dir])
        out = capsys.readouterr().out
        assert "tests passed" in out
        # the synthetic lineitem has duplicate (orderkey, linenumber)
        # pairs, so the pack reports >=1 failure and exits 1
        assert "FAIL unique_combination_orderkey_linenumber" in out
        assert rc == 1

    def test_cli_freshness_exit_on_stale_sources(
        self, spark, sf_dir, capsys
    ):
        from dbt_eamples_spark import cli

        rc = cli.main(["freshness", "--sf-dir", sf_dir])
        out = capsys.readouterr().out
        assert "FRESH events" in out
        assert "ERROR orders" in out  # historical TPC-H dates
        assert rc == 1


class TestCliDocs:
    def test_catalog_document_complete(self, spark, sf_dir, tmp_path, capsys):
        from dbt_eamples_spark import cli
        from dbt_eamples_spark.catalog import TABLES
        from dbt_eamples_spark.plans.saved import SAVED_QUERIES
        from dbt_eamples_spark.plans.semantics import default_registry

        out = str(tmp_path / "CATALOG.md")
        rc = cli.main(["docs", "--sf-dir", sf_dir, "--output", out])
        assert rc == 0
        doc = open(out).read()
        for t in TABLES:
            assert f"### {t}" in doc
        for m in default_registry().list_metrics():
            assert f"**{m}**" in doc
        for s in SAVED_QUERIES:
            assert f"**{s}**" in doc
        assert "conversion" in doc  # metric types surface


class TestBacklogDaily:
    def test_running_sum_matches_interval_stabbing(self, spark, sf_dir):
        import datetime as dt

        from dbt_eamples_spark.operators.relational import (
            orders_backlog_daily,
        )

        rows = sorted(
            orders_backlog_daily(spark, sf_dir).collect(),
            key=lambda r: r["day"],
        )
        # independent recompute: brute-force interval stabbing
        li = load_table(spark, sf_dir, "lineitem").collect()
        o = {
            r["o_orderkey"]: r["o_orderdate"]
            for r in load_table(spark, sf_dir, "orders").collect()
        }
        last = {}
        for r in li:
            k = r["l_orderkey"]
            d = r["l_shipdate"]
            if k in o:
                last[k] = max(last.get(k, d), d)
        # clamp like the operator: inverted fixture spans (lines
        # shipped before the order date) are 1-day opens
        spans = []
        for k, v in last.items():
            a = o[k].date() if hasattr(o[k], "date") else o[k]
            b = v.date() if hasattr(v, "date") else v
            spans.append((a, max(a, b)))
        for r in rows[:50]:
            day = dt.date.fromisoformat(r["day"])
            open_n = sum(1 for a, b in spans if a <= day <= b)
            assert r["open_orders"] == open_n
        # backlog returns to zero after the last close event
        assert rows[-1]["open_orders"] == 0


class TestSupplierLeadTime:
    def test_rank_dense_and_mean_exact(self, spark, sf_dir):
        from dbt_eamples_spark.operators.relational import (
            supplier_lead_time_rank,
        )

        rows = sorted(
            supplier_lead_time_rank(spark, sf_dir).collect(),
            key=lambda r: (r["lead_time_rank"], r["s_suppkey"]),
        )
        assert rows
        # dense: ranks are 1..K with no gaps over distinct means
        means = sorted({r["mean_delay_days"] for r in rows})
        assert max(r["lead_time_rank"] for r in rows) == len(means)
        for r in rows:
            assert r["lead_time_rank"] == means.index(r["mean_delay_days"]) + 1
            assert (
                abs(
                    r["mean_delay_days"]
                    - round(r["delay_days_sum"] / r["n_lines"], 4)
                )
                < 1e-9
            )

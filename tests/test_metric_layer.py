"""Metric layer: registry resolution, compiler golden SQL, CLI
surface (the reference's `dbt_query.py` / `dbt_query2.py` behavior)."""

from __future__ import annotations

import os

import pytest

from dbt_eamples_spark.cli import main as cli_main
from dbt_eamples_spark.plans.compiler import (
    MetricQueryRequest,
    compile_request,
    execute,
)
from dbt_eamples_spark.plans.semantics import default_registry


class TestRegistry:
    def test_list_metrics(self):
        reg = default_registry()
        assert "revenue" in reg.list_metrics()
        assert "urgent_order_count" in reg.list_metrics()

    def test_unknown_metric_fails_fast(self):
        reg = default_registry()
        with pytest.raises(KeyError, match="not found"):
            reg.metric("nope")

    def test_dimensions_for_metric_walks_star(self):
        reg = default_registry()
        dims = reg.dimensions_for_metric("revenue")
        # own dims + full customer→nation→region chain via orders
        assert "lineitem.returnflag" in dims
        assert "customer.mktsegment" in dims
        assert "region.region_name" in dims

    def test_accompanying_dimensions_same_model(self):
        reg = default_registry()
        acc = reg.accompanying_dimensions("orders.orderstatus")
        assert "orders.orderpriority" in acc
        assert "orders.orderstatus" not in acc

    def test_bare_dimension_resolution(self):
        reg = default_registry()
        model, dim = reg.resolve_dimension("mktsegment")
        assert model == "customer" and dim.column == "c_mktsegment"

    def test_join_path(self):
        reg = default_registry()
        assert reg.join_path("lineitem", "region") == [
            "order",
            "customer",
            "nation",
            "region",
        ]


class TestCompiler:
    def test_golden_sql_star(self):
        compiled = compile_request(
            MetricQueryRequest(
                metrics=("revenue",),
                group_by=("nation_name",),
                start_time="1995-01-01 00:00:00",
                order_by=("-revenue",),
                limit=5,
            )
        )
        sql = compiled.sql
        assert "FROM lineitem" in sql
        assert "JOIN orders ON l_orderkey = o_orderkey" in sql
        assert "JOIN nation ON c_nationkey = n_nationkey" in sql
        assert "BROADCAST(" in sql
        assert "ORDER BY revenue DESC" in sql
        assert sql.rstrip().endswith("LIMIT 5")
        assert "<ScanNode table=lineitem>" in compiled.dataflow_text

    def test_filtered_metric_compiles_to_case(self):
        sql = compile_request(
            MetricQueryRequest(metrics=("urgent_order_count",))
        ).sql
        assert "CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END" in sql

    def test_time_grain_compiles_to_date_trunc(self):
        sql = compile_request(
            MetricQueryRequest(
                metrics=("revenue",), group_by=("shipdate__month",)
            )
        ).sql
        assert "date_trunc('month', l_shipdate) AS shipdate__month" in sql
        assert "GROUP BY shipdate__month" in sql

    def test_unknown_grain_rejected(self):
        with pytest.raises(ValueError, match="unknown time grain"):
            compile_request(
                MetricQueryRequest(
                    metrics=("revenue",), group_by=("shipdate__decade",)
                )
            )

    def test_grain_on_categorical_rejected(self):
        with pytest.raises(ValueError, match="non-time dimension"):
            compile_request(
                MetricQueryRequest(
                    metrics=("revenue",), group_by=("returnflag__month",)
                )
            )

    def test_ratio_metric_compiles_to_division(self):
        sql = compile_request(
            MetricQueryRequest(
                metrics=("revenue_per_item",), group_by=("returnflag",)
            )
        ).sql
        assert "/ COUNT(1)" in sql

    def test_cumulative_compiles_to_window(self):
        sql = compile_request(
            MetricQueryRequest(
                metrics=("cum_revenue",), group_by=("returnflag", "shipdate__month")
            )
        ).sql
        assert "OVER (PARTITION BY l_returnflag ORDER BY" in sql

    def test_cumulative_without_time_dim_rejected(self):
        with pytest.raises(ValueError, match="time-grained"):
            compile_request(
                MetricQueryRequest(
                    metrics=("cum_revenue",), group_by=("returnflag",)
                )
            )

    def test_dimension_sweep_single_scan(self):
        from dbt_eamples_spark.plans.compiler import compile_dimension_sweep

        sql = compile_dimension_sweep("revenue").sql
        assert sql.count("FROM lineitem") == 1
        assert "GROUPING SETS" in sql
        assert "grouping_dim" in sql

    def test_multi_model_metrics_rejected(self):
        with pytest.raises(ValueError, match="multiple models"):
            compile_request(MetricQueryRequest(metrics=("revenue", "order_total")))

    def test_no_metrics_rejected(self):
        with pytest.raises(ValueError):
            compile_request(MetricQueryRequest(metrics=()))

    def test_execute_returns_rows(self, spark, sf_dir):
        compiled = execute(
            spark,
            sf_dir,
            MetricQueryRequest(metrics=("order_count",), group_by=("orderstatus",)),
        )
        rows = compiled.df.collect()
        assert sum(r.order_count for r in rows) == 1500


class TestCLI:
    def test_explain_no_spark(self, capsys):
        rc = cli_main(
            [
                "query",
                "--metrics",
                "revenue",
                "--group-by",
                "nation_name",
                "--explain",
            ]
        )
        out = capsys.readouterr().out
        assert rc == 0
        assert "rendered SQL" in out and "dataflow plan" in out

    def test_dump_queries_writes_files(self, tmp_path, capsys):
        rc = cli_main(
            ["dump-queries", "--metric", "order_total", "--output-dir", str(tmp_path)]
        )
        assert rc == 0
        files = sorted(os.listdir(tmp_path))
        assert "orders_orderstatus.sql" in files
        assert "region_region_name.sql" in files
        sql = (tmp_path / "orders_orderstatus.sql").read_text()
        assert "GROUP BY orderstatus" in sql

    def test_query_csv_output(self, spark, sf_dir, tmp_path, capsys):
        import glob

        out = str(tmp_path / "rev_csv")
        rc = cli_main(
            [
                "query",
                "--metrics",
                "order_count",
                "--group-by",
                "orderstatus",
                "--csv",
                out,
                "--sf-dir",
                sf_dir,
            ]
        )
        assert rc == 0
        parts = glob.glob(f"{out}/part-*.csv")
        assert parts, "expected a CSV part file"
        text = open(parts[0]).read()
        assert text.splitlines()[0] == "orderstatus,order_count"
        assert len(text.splitlines()) == 4  # header + 3 statuses

    def test_sweep_explain(self, capsys):
        rc = cli_main(["sweep", "--metric", "revenue", "--explain"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "GROUPING SETS" in out

    def test_sweep_unknown_metric(self, capsys):
        rc = cli_main(["sweep", "--metric", "nope", "--explain"])
        assert rc == 1

    def test_dump_queries_unknown_metric(self, capsys):
        rc = cli_main(["dump-queries", "--metric", "nope", "--output-dir", "/tmp/x"])
        assert rc == 1

    def test_saved_query_matches_driver_entry(self, capsys):
        """--saved-query resolves to the exact request the driver
        contract executes (dbt_query.py:64-66 preset semantics)."""
        from dbt_eamples_spark.plans.saved import SAVED_QUERIES

        import __spark_entry__ as entry

        assert entry.METRIC_REQUESTS is SAVED_QUERIES
        rc = cli_main(["query", "--saved-query", "metric_compiled_topk", "--explain"])
        out = capsys.readouterr().out
        assert rc == 0
        assert compile_request(SAVED_QUERIES["metric_compiled_topk"]).sql in out

    def test_saved_query_errors(self, capsys):
        assert cli_main(["query", "--saved-query", "nope", "--explain"]) == 1
        assert (
            cli_main(
                ["query", "--saved-query", "metric_compiled_topk", "--metrics", "x"]
            )
            == 1
        )
        assert cli_main(["query", "--explain"]) == 1


class TestCurateCLI:
    def test_curate_prints_and_writes_csv(self, sf_dir, tmp_path, capsys):
        rc = cli_main(
            ["curate", "--op", "source-rollup", "--sf-dir", sf_dir, "--limit", "3"]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "src" in out
        csv_path = str(tmp_path / "keep_csv")
        rc = cli_main(
            ["curate", "--op", "keep-list", "--sf-dir", sf_dir, "--csv", csv_path]
        )
        assert rc == 0
        import glob

        assert glob.glob(f"{csv_path}/*.csv")


class TestPlanArtifacts:
    def test_dot_and_svg_render_the_chain(self):
        import xml.etree.ElementTree as ET

        from dbt_eamples_spark.plans.compiler import (
            compile_request,
            dataflow_dot,
            dataflow_svg,
        )
        from dbt_eamples_spark.plans.saved import SAVED_QUERIES

        compiled = compile_request(SAVED_QUERIES["metric_compiled_star"])
        dot = dataflow_dot(compiled)
        assert dot.startswith("digraph dataflow")
        assert "ScanNode table=lineitem" in dot
        assert "AggregateNode" in dot
        # scan is the root (execution order): n0, with edges n0->n1->...
        assert 'n0 [label="ScanNode' in dot and "n0 -> n1;" in dot
        svg = dataflow_svg(compiled)
        root = ET.fromstring(svg)  # well-formed XML
        texts = [t.text for t in root.iter() if t.tag.endswith("text")]
        assert any("ScanNode" in t for t in texts)
        assert len(texts) == len(
            [line for line in compiled.dataflow_text.splitlines() if line.strip()]
        )

    def test_cli_writes_artifacts(self, tmp_path, capsys):
        import xml.etree.ElementTree as ET

        from dbt_eamples_spark.cli import main

        svg = tmp_path / "plan.svg"
        dot = tmp_path / "plan.dot"
        rc = main(
            [
                "query",
                "--saved-query",
                "metric_compiled_star",
                "--explain",
                "--plan-svg",
                str(svg),
                "--plan-dot",
                str(dot),
            ]
        )
        assert rc == 0
        ET.parse(svg)
        assert dot.read_text().startswith("digraph dataflow")


class TestGrowthMetric:
    def test_growth_matches_hand_lag(self, spark, sf_dir):
        from dbt_eamples_spark.plans.compiler import execute
        from dbt_eamples_spark.plans.saved import SAVED_QUERIES

        df = execute(
            spark, sf_dir, SAVED_QUERIES["metric_compiled_growth"]
        ).df
        rows = sorted(
            df.collect(), key=lambda r: (r["returnflag"], r["shipdate__month"])
        )
        by_flag: dict[str, list] = {}
        for r in rows:
            by_flag.setdefault(r["returnflag"], []).append(r)
        import math

        checked = 0
        for series in by_flag.values():
            assert series[0]["revenue_growth"] is None  # no prior period
            for prev, cur in zip(series, series[1:]):
                if cur["revenue_growth"] is None:
                    continue
                expected = round(
                    (cur["revenue"] - prev["revenue"]) / prev["revenue"], 6
                )
                assert math.isclose(
                    cur["revenue_growth"], expected, rel_tol=0, abs_tol=2e-6
                )
                checked += 1
        assert checked > 50

    def test_growth_requires_time_grain(self, spark, sf_dir):
        import pytest as _pytest

        from dbt_eamples_spark.plans.compiler import (
            MetricQueryRequest,
            compile_request,
        )

        with _pytest.raises(ValueError, match="growth metric"):
            compile_request(
                MetricQueryRequest(
                    metrics=("revenue_growth",), group_by=("returnflag",)
                )
            )


class TestDerivedMetric:
    def test_inlines_inputs_in_one_pass(self):
        req = MetricQueryRequest(
            metrics=("discount_amount",), group_by=("returnflag",)
        )
        sql = compile_request(req).sql
        # both input expressions inline into the single SELECT —
        # no second scan, no self-join of the aggregate
        assert sql.count("FROM lineitem") == 1
        assert "ROUND((ROUND(SUM(l_extendedprice)" in sql.replace("\n", " ")

    def test_substitution_is_word_bounded(self):
        # "revenue" must NOT clobber the inside of "gross_revenue":
        # the rendered SQL keeps both full expressions
        req = MetricQueryRequest(
            metrics=("discount_amount",), group_by=("returnflag",)
        )
        sql = compile_request(req).sql
        assert "SUM(l_extendedprice)" in sql  # gross input survived
        assert "SUM(l_extendedprice * (1 - l_discount))" in sql

    def test_window_inputs_rejected(self):
        from dbt_eamples_spark.plans.semantics import Metric

        reg = default_registry()
        reg.add_metric(
            Metric(
                "bad_derived",
                "lineitem",
                "revenue",
                metric_type="derived",
                expr="cum_revenue - revenue",
                inputs=("cum_revenue", "revenue"),
            )
        )
        from dbt_eamples_spark.plans.compiler import _metric_select

        with pytest.raises(ValueError, match="window type"):
            _metric_select(reg, "bad_derived", ("shipdate__month",), ())

    def test_derived_values_consistent(self, spark, sf_dir):
        req = MetricQueryRequest(
            metrics=("gross_revenue", "revenue", "discount_amount"),
            group_by=("returnflag", "linestatus"),
        )
        rows = execute(spark, sf_dir, req).df.collect()
        assert rows
        for r in rows:
            assert (
                abs(
                    r["discount_amount"]
                    - round(r["gross_revenue"] - r["revenue"], 2)
                )
                < 0.011  # inputs rounded independently of the difference
            )


class TestConversionMetric:
    def test_compiles_to_funnel_pipeline(self):
        from dbt_eamples_spark.plans.compiler import compile_request
        from dbt_eamples_spark.plans.saved import SAVED_QUERIES

        c = compile_request(SAVED_QUERIES["metric_compiled_conversion"])
        assert "INTERVAL 7 DAY" in c.sql
        assert "SELECT DISTINCT" in c.sql  # one conversion per base event
        assert "ConversionJoinNode" in c.dataflow_text
        assert c.tables == ("events",)

    def test_conversion_must_compile_alone(self):
        import pytest as _pytest

        from dbt_eamples_spark.plans.compiler import (
            MetricQueryRequest,
            compile_request,
        )

        with _pytest.raises(ValueError, match="alone"):
            compile_request(
                MetricQueryRequest(
                    metrics=("view_to_purchase", "event_count"),
                )
            )

    def test_no_join_hops(self):
        import pytest as _pytest

        from dbt_eamples_spark.plans.compiler import (
            MetricQueryRequest,
            compile_request,
        )

        with _pytest.raises((ValueError, KeyError)):
            compile_request(
                MetricQueryRequest(
                    metrics=("view_to_purchase",),
                    group_by=("nation_name",),
                )
            )

    def test_values_match_independent_recompute(self, spark, sf_dir):
        import datetime as dt

        from dbt_eamples_spark.catalog import load_table
        from dbt_eamples_spark.plans.compiler import execute
        from dbt_eamples_spark.plans.saved import SAVED_QUERIES

        rows = execute(
            spark, sf_dir, SAVED_QUERIES["metric_compiled_conversion"]
        ).df.collect()
        assert rows
        ev = load_table(spark, sf_dir, "events").collect()
        views = [
            (r["user_id"], r["ts"]) for r in ev if r["event_type"] == "view"
        ]
        buys = {}
        for r in ev:
            if r["event_type"] == "purchase":
                buys.setdefault(r["user_id"], []).append(r["ts"])
        win = dt.timedelta(days=7)
        opp, conv = {}, {}
        for uid, ts in views:
            day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
            opp[day] = opp.get(day, 0) + 1
            if any(ts <= b <= ts + win for b in buys.get(uid, ())):
                conv[day] = conv.get(day, 0) + 1
        for r in rows:
            day = r["event_time__day"]
            assert r["view_to_purchase_opportunities"] == opp[day]
            assert r["view_to_purchase_conversions"] == conv.get(day, 0)
            assert 0.0 <= r["view_to_purchase"] <= 1.0
        assert sum(opp.values()) == sum(
            r["view_to_purchase_opportunities"] for r in rows
        )

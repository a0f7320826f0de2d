"""Metric CLI (reference surface: `dbt_query.py:55-183` ``query``,
`dbt_query2.py:15-82` ``dump_queries``).

    python -m dbt_eamples_spark.cli query \
        --metrics revenue --group-by nation_name,region_name \
        --start-time 1995-01-01 --order -revenue --limit 10

    python -m dbt_eamples_spark.cli dump-queries \
        --metric revenue --output-dir ./generated

Options mirror the reference one-for-one: metrics, group-by, where,
start/end time, order (``-name`` = desc), limit, csv, explain,
decimals; dump-queries enumerates a metric's dimensions, adds each
dimension's accompanying dimensions (same semantic model,
`dbt_query2.py:52-60`), and writes one rendered SQL file per
dimension with sanitized names (`dbt_query2.py:74`).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from pyspark.sql import functions as F

from dbt_eamples_spark.plans.compiler import (
    MetricQueryRequest,
    compile_request,
    execute,
    explain_text,
)
from dbt_eamples_spark.plans.semantics import default_registry
from dbt_eamples_spark.sources.sinks import result_text_format, sink_csv

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _split_csv(v: str | None) -> tuple[str, ...]:
    return tuple(x.strip() for x in v.split(",") if x.strip()) if v else ()


def cmd_query(args: argparse.Namespace) -> int:
    if args.saved_query:
        # named preset (`dbt_query.py:64-66`) — mutually exclusive
        # with spelling the query out
        if args.metrics or args.group_by or args.where:
            print(
                "error: --saved-query replaces --metrics/--group-by/--where",
                file=sys.stderr,
            )
            return 1
        from dbt_eamples_spark.plans.saved import SAVED_QUERIES

        if args.saved_query not in SAVED_QUERIES:
            print(
                f"error: unknown saved query {args.saved_query!r}; "
                f"available: {sorted(SAVED_QUERIES)}",
                file=sys.stderr,
            )
            return 1
        request = SAVED_QUERIES[args.saved_query]
    elif not args.metrics:
        print("error: one of --metrics / --saved-query is required", file=sys.stderr)
        return 1
    else:
        request = MetricQueryRequest(
            metrics=_split_csv(args.metrics),
            group_by=_split_csv(args.group_by),
            where=args.where,
            start_time=args.start_time,
            end_time=args.end_time,
            order_by=_split_csv(args.order),
            limit=args.limit,
        )
    start = time.time()
    try:
        return _run_query(args, request, start)
    except (KeyError, ValueError) as exc:
        # fail fast with a clean message (the reference prints and
        # exits on unknown metric, dbt_query2.py:28-32)
        print(f"error: {exc}", file=sys.stderr)
        return 1


def _write_plan_artifacts(args: argparse.Namespace, compiled) -> None:
    """Plan-DAG artifacts (the reference renders its dataflow to SVG
    and displays it, dbt_query.py:127-132,150-153; we write DOT
    and/or a dependency-free SVG)."""
    if getattr(args, "plan_dot", None):
        from dbt_eamples_spark.plans.compiler import dataflow_dot

        with open(args.plan_dot, "w") as f:
            f.write(dataflow_dot(compiled) + "\n")
        print(f"wrote plan DOT to {args.plan_dot}")
    if getattr(args, "plan_svg", None):
        from dbt_eamples_spark.plans.compiler import dataflow_svg

        with open(args.plan_svg, "w") as f:
            f.write(dataflow_svg(compiled) + "\n")
        print(f"wrote plan SVG to {args.plan_svg}")


def _run_query(
    args: argparse.Namespace, request: MetricQueryRequest, start: float
) -> int:
    if args.explain:
        compiled = compile_request(request)
        _write_plan_artifacts(args, compiled)
        print("-- rendered SQL --")
        print(compiled.sql)
        print("\n-- dataflow plan --")
        print(compiled.dataflow_text)
        if args.physical:
            from dbt_eamples_spark.session import get_spark

            spark = get_spark("metric-cli")
            from dbt_eamples_spark.catalog import register_tables

            register_tables(spark, args.sf_dir)
            print("\n-- physical plan --")
            print(explain_text(spark, compiled))
        return 0
    from dbt_eamples_spark.session import get_spark

    spark = get_spark("metric-cli")
    spark.sparkContext.setLogLevel("ERROR")
    compiled = execute(spark, args.sf_dir, request)
    assert compiled.df is not None
    _write_plan_artifacts(args, compiled)
    if args.csv:
        # plain decimal formatting in CSV (Spark's double writer emits
        # scientific notation; the reference wrote display-rounded rows,
        # dbt_query.py:141-147)
        out = compiled.df
        for name, dtype in out.dtypes:
            if dtype == "double":
                out = out.withColumn(
                    name, F.col(name).cast(f"decimal(38,{args.decimals})")
                )
        sink_csv(out.coalesce(1), args.csv)
        print(f"wrote CSV to {args.csv}")
    else:
        print(result_text_format(compiled.df, decimals=args.decimals))
    print(f"done in {time.time() - start:.2f}s")
    return 0


def cmd_dump_queries(args: argparse.Namespace) -> int:
    reg = default_registry()
    if args.metric not in reg.list_metrics():
        print(
            f"metric {args.metric!r} not found; available: {reg.list_metrics()}",
            file=sys.stderr,
        )
        return 1
    os.makedirs(args.output_dir, exist_ok=True)
    written = []
    for qdim in reg.dimensions_for_metric(args.metric):
        group_by = [qdim, *reg.accompanying_dimensions(qdim)]
        compiled = compile_request(
            MetricQueryRequest(metrics=(args.metric,), group_by=tuple(group_by))
        )
        fname = qdim.replace(".", "_").replace("/", "_") + ".sql"
        path = os.path.join(args.output_dir, fname)
        with open(path, "w") as f:
            f.write(compiled.sql + "\n")
        written.append(path)
    print(f"wrote {len(written)} SQL files to {args.output_dir}")
    return 0


def cmd_sweep(args: argparse.Namespace) -> int:
    """One-pass per-dimension sweep (the single-scan form of
    dump-queries' N per-dimension queries)."""
    from dbt_eamples_spark.plans.compiler import compile_dimension_sweep

    try:
        compiled = compile_dimension_sweep(args.metric)
    except (KeyError, ValueError) as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 1
    if args.explain:
        print("-- rendered SQL --")
        print(compiled.sql)
        print("\n-- dataflow plan --")
        print(compiled.dataflow_text)
        return 0
    from dbt_eamples_spark.catalog import register_tables
    from dbt_eamples_spark.session import get_spark

    spark = get_spark("metric-sweep")
    register_tables(spark, args.sf_dir)
    df = spark.sql(compiled.sql)
    print(result_text_format(df, decimals=args.decimals))
    return 0


# curation operators exposed on the CLI: name -> (module, function).
# Lazy-imported so `query --explain` never pays Spark startup.
CURATE_OPS = {
    "keep-list": ("dbt_eamples_spark.operators.dedup", "corpus_keep_list"),
    "decontaminate": (
        "dbt_eamples_spark.operators.curation",
        "text_decontaminate",
    ),
    "pack": ("dbt_eamples_spark.operators.curation", "pack_concat_chunks"),
    "source-rollup": (
        "dbt_eamples_spark.operators.text",
        "source_quality_rollup",
    ),
    "sample": ("dbt_eamples_spark.operators.sampling", "sample_stratified"),
}


def cmd_curate(args: argparse.Namespace) -> int:
    """Run a corpus-curation operator and print/CSV the result —
    the dataset-side counterpart of the metric `query` command."""
    import importlib

    mod_name, fn_name = CURATE_OPS[args.op]
    fn = getattr(importlib.import_module(mod_name), fn_name)
    from dbt_eamples_spark.session import get_spark

    spark = get_spark("curate")
    df = fn(spark, args.sf_dir)
    if args.csv:
        from dbt_eamples_spark.sources.sinks import sink_csv

        sink_csv(df, args.csv)
        print(f"wrote {args.csv}")
        return 0
    print(result_text_format(df.limit(args.limit), decimals=args.decimals))
    return 0


def cmd_health(args: argparse.Namespace) -> int:
    """Uptime probe (S9): print the probe row, exit non-zero on any
    failure so cron/scheduler alerting fires — no SparkSession
    needed for a single HTTP check."""
    from dbt_eamples_spark.sources.health import HealthProbeFailed, probe_url

    try:
        row = probe_url(args.url, timeout=args.timeout)
    except HealthProbeFailed as e:
        print(f"FAIL {args.url}: {e}")
        return 1
    print(f"OK {row['url']} status={row['status']} {row['elapsed_ms']}ms")
    return 0


def cmd_tune(args: argparse.Namespace) -> int:
    """Print the production ANN operating point for a corpus size —
    the dial a deployment turns before running the LSH/IVF operators
    at a scale the pinned fixture constants no longer fit (no
    SparkSession needed; pure arithmetic)."""
    from dbt_eamples_spark.operators.similarity import (
        LSH_PLANES,
        NCENTROIDS,
        ivf_cells,
        lsh_planes,
    )

    n = args.n_rows
    planes = lsh_planes(n, target_bucket=args.target_bucket)
    cells = ivf_cells(n)
    print(f"n_rows={n}")
    print(
        f"lsh_planes={planes} (2^{planes}={2**planes} buckets/table; "
        f"fixture default {LSH_PLANES})"
    )
    print(f"ivf_cells={cells} (sqrt-n rule; fixture default {NCENTROIDS})")
    print(
        "usage: similarity_lsh_topk(spark, sf, nplanes=%d) / "
        "dedup_embedding_cosine(spark, sf, nplanes=%d) / "
        "similarity_ivf_topk(spark, sf, ncells=%d)" % (planes, planes, cells)
    )
    return 0


def cmd_test(args: argparse.Namespace) -> int:
    """``dbt test`` UX: run the generic + dbt-utils test packs,
    print one row per test, exit non-zero iff any test failed —
    the scheduler contract (`transactions_dag.py` alerting wants an
    exit code, not a DataFrame)."""
    from dbt_eamples_spark.operators.quality import (
        dq_advanced_tests,
        dq_schema_tests,
    )
    from dbt_eamples_spark.session import get_spark

    spark = get_spark("cli-test")
    rows = (
        dq_schema_tests(spark, args.sf_dir)
        .unionByName(dq_advanced_tests(spark, args.sf_dir))
        .collect()
    )
    failed = 0
    for r in rows:
        mark = "PASS" if r["passed"] else "FAIL"
        print(f"{mark} {r['test_name']}: {r['n_violations']} violations")
        failed += 0 if r["passed"] else 1
    print(f"{len(rows) - failed} of {len(rows)} tests passed")
    return 1 if failed else 0


def cmd_unit_test(args: argparse.Namespace) -> int:
    """``dbt test`` on model UNIT tests (dbt 1.8 `unit_tests:`):
    literal mocked inputs through the real metric compiler, exact
    row diffs, one line per test, exit non-zero iff any failed."""
    from dbt_eamples_spark.plans.unit_tests import run_all
    from dbt_eamples_spark.session import get_spark

    spark = get_spark("cli-unit-test")
    results = run_all(spark, args.sf_dir)
    failed = 0
    for r in results:
        print(f"{'PASS' if r.passed else 'FAIL'} {r.name}: {r.message}")
        failed += 0 if r.passed else 1
    print(f"{len(results) - failed} of {len(results)} unit tests passed")
    return 1 if failed else 0


def cmd_freshness(args: argparse.Namespace) -> int:
    """``dbt source freshness`` UX: print the per-source staleness
    report; exit 1 on any error-status source (warn keeps exit 0,
    matching dbt's default)."""
    from dbt_eamples_spark.operators.quality import dq_source_freshness
    from dbt_eamples_spark.session import get_spark

    spark = get_spark("cli-freshness")
    rows = dq_source_freshness(spark, args.sf_dir).collect()
    errors = 0
    for r in rows:
        print(
            f"{r['status'].upper():5s} {r['source_name']}: max_loaded_at="
            f"{r['max_loaded_at']} staleness={r['staleness_hours']}h"
        )
        errors += 1 if r["status"] == "error" else 0
    return 1 if errors else 0


def cmd_docs(args: argparse.Namespace) -> int:
    """``dbt docs generate`` UX: write a markdown catalog of the
    warehouse — every table's schema (from the live parquet
    footers), every semantic model's dimensions/measures, every
    metric with its type and description, and the saved-query
    presets. One file, reviewable in a PR — the documentation
    artifact dbt renders as a website, kept engine-side as plain
    markdown."""
    from dbt_eamples_spark.catalog import TABLES, load_table
    from dbt_eamples_spark.plans.saved import SAVED_QUERIES
    from dbt_eamples_spark.session import get_spark

    reg = default_registry()
    spark = get_spark("cli-docs")
    lines = ["# Warehouse catalog", ""]
    lines += ["## Tables", ""]
    for t in TABLES:
        df = load_table(spark, args.sf_dir, t)
        lines.append(f"### {t}")
        lines.append("")
        lines.append("| column | type |")
        lines.append("|---|---|")
        for f in df.schema.fields:
            lines.append(f"| {f.name} | {f.dataType.simpleString()} |")
        lines.append("")
    lines += ["## Semantic models", ""]
    for name, model in sorted(reg.models.items()):
        dims = ", ".join(d.name for d in model.dimensions) or "—"
        meas = ", ".join(m.name for m in model.measures) or "—"
        lines.append(
            f"- **{name}** (table `{model.table}`): dimensions {dims}; "
            f"measures {meas}"
        )
    lines += ["", "## Metrics", ""]
    for name in reg.list_metrics():
        m = reg.metric(name)
        lines.append(
            f"- **{name}** ({m.metric_type}) — {m.description or name}"
        )
    lines += ["", "## Saved queries", ""]
    for name, req in sorted(SAVED_QUERIES.items()):
        lines.append(
            f"- **{name}**: metrics={list(req.metrics)} "
            f"group_by={list(req.group_by)}"
        )
    out = args.output or "CATALOG.md"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dbt-eamples-spark")
    sub = p.add_subparsers(dest="command", required=True)

    q = sub.add_parser("query", help="run a metric query")
    q.add_argument("--metrics", help="comma-separated metric names")
    q.add_argument(
        "--saved-query",
        help="run a named preset from plans.saved (replaces --metrics et al.)",
    )
    q.add_argument("--group-by", help="comma-separated dimension names")
    q.add_argument("--where", help="SQL constraint")
    q.add_argument("--start-time", help="inclusive time lower bound")
    q.add_argument("--end-time", help="inclusive time upper bound")
    q.add_argument("--order", help="comma-separated; -name for desc")
    q.add_argument("--limit", type=int)
    q.add_argument("--csv", help="write result CSV to this path")
    q.add_argument("--explain", action="store_true", help="show SQL + plan only")
    q.add_argument("--physical", action="store_true", help="with --explain: physical plan")
    q.add_argument("--plan-dot", help="write the dataflow plan as Graphviz DOT")
    q.add_argument("--plan-svg", help="write the dataflow plan as SVG")
    q.add_argument("--decimals", type=int, default=2)
    q.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    q.set_defaults(func=cmd_query)

    d = sub.add_parser("dump-queries", help="render per-dimension SQL files")
    d.add_argument("--metric", required=True)
    d.add_argument("--output-dir", required=True)
    d.set_defaults(func=cmd_dump_queries)

    s = sub.add_parser(
        "sweep", help="metric by every dimension in one GROUPING SETS pass"
    )
    s.add_argument("--metric", required=True)
    s.add_argument("--explain", action="store_true", help="show SQL only")
    s.add_argument("--decimals", type=int, default=2)
    s.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    s.set_defaults(func=cmd_sweep)

    c = sub.add_parser(
        "curate", help="run a corpus-curation operator (dedup/decontaminate/...)"
    )
    c.add_argument("--op", required=True, choices=sorted(CURATE_OPS))
    c.add_argument("--csv", help="write full result CSV to this path")
    c.add_argument("--limit", type=int, default=20, help="rows to print")
    c.add_argument("--decimals", type=int, default=2)
    c.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    c.set_defaults(func=cmd_curate)

    h = sub.add_parser(
        "health", help="HTTP health probe (exit 0 iff the URL answers 200)"
    )
    h.add_argument("--url", required=True)
    h.add_argument("--timeout", type=float, default=5.0)
    h.set_defaults(func=cmd_health)

    t = sub.add_parser(
        "tune", help="ANN operating point (LSH planes / IVF cells) for n rows"
    )
    t.add_argument("--n-rows", type=int, required=True)
    t.add_argument("--target-bucket", type=int, default=64)
    t.set_defaults(func=cmd_tune)

    dt = sub.add_parser(
        "test", help="run data-quality test packs (exit 1 on failure)"
    )
    dt.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    dt.set_defaults(func=cmd_test)

    ut = sub.add_parser(
        "unit-test",
        help="run model unit tests (mocked inputs, exact diffs)",
    )
    ut.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ut.set_defaults(func=cmd_unit_test)

    fr = sub.add_parser(
        "freshness",
        help="source freshness report (exit 1 on any error-stale source)",
    )
    fr.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    fr.set_defaults(func=cmd_freshness)

    dc = sub.add_parser(
        "docs", help="generate the markdown warehouse catalog"
    )
    dc.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    dc.add_argument("--output", default=None)
    dc.set_defaults(func=cmd_docs)

    ar = sub.add_parser(
        "artifacts", help="inspect or expire the persisted index store"
    )
    ar.add_argument("action", choices=["list", "gc"])
    ar.add_argument("--max-age-days", type=float, default=None)
    ar.add_argument("--keep-latest", type=int, default=None)
    ar.add_argument(
        "--max-total-gb", type=float, default=None,
        help="byte budget: evict largest-stalest survivors until "
        "the store fits",
    )
    ar.set_defaults(func=cmd_artifacts)
    return p


def cmd_artifacts(args: argparse.Namespace) -> int:
    """Artifact-store operations: ``list`` prints the inventory
    (kind, fingerprint, size, usage stamps); ``gc`` applies the
    retention policy (--max-age-days, --keep-latest and/or the
    --max-total-gb byte budget) and
    prints what it removed — the expiry path a store keyed by
    corpus fingerprint needs (every source rewrite strands the
    previous index)."""
    import json as _json

    from dbt_eamples_spark.artifacts import gc_artifacts, list_artifacts

    if args.action == "list":
        for row in list_artifacts():
            print(_json.dumps(row, sort_keys=True, default=str))
        return 0
    removed = gc_artifacts(
        max_age_seconds=(
            args.max_age_days * 86400.0
            if args.max_age_days is not None
            else None
        ),
        keep_latest_per_kind=args.keep_latest,
        max_total_bytes=(
            int(args.max_total_gb * 1024**3)
            if args.max_total_gb is not None
            else None
        ),
    )
    for row in removed:
        print(f"removed {row['kind']}/{row['fingerprint']}")
    print(f"{len(removed)} artifact(s) removed")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())

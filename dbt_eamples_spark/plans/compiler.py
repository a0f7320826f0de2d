"""Metric query compiler (SURVEY.md M2; reference lifecycle §3.1).

Re-expresses the MetricFlow request→plan→SQL pipeline the reference
drives externally (`dbt_query.py:77-117`: build
``MetricFlowQueryRequest`` → ``mf.explain/query`` → dataflow plan +
rendered SQL): a ``MetricQueryRequest`` resolves against the
semantic registry and compiles to

 - **rendered SQL** (ANSI — runs verbatim on ``spark.sql`` AND on
   DuckDB, which is how every compiled metric query gets a
   correctness oracle for free),
 - a **DataFrame** (Catalyst owns join selection/pushdown; the
   emitted SQL carries a BROADCAST hint for the dimension chain,
   which DuckDB ignores as a comment),
 - a **dataflow plan text** (the ``structure_text()`` surface of
   `dbt_query.py:117`).

Scale: the fact table is never materialized pre-aggregation; the
dimension chain joins are hinted broadcast; filters land in WHERE so
they push into the scan; multi-metric requests over one model
compile to a single scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
import datetime as dt
import re

from pyspark.sql import DataFrame, SparkSession

from dbt_eamples_spark.plans.semantics import (
    ENTITY_JOIN_KEYS,
    TIME_GRAINS,
    Registry,
    default_registry,
)

# Metric rounding inside compiled SQL, 2 dp — the reference CLI's
# display default (`dbt_query.py:29-34`), and the scale-robust
# choice: summing ~1e9-magnitude floats in different partial-
# aggregation orders diverges across engines by ~1e-3 at sf0.1
# (random-walk of 1-ulp errors over 600k adds), so finer rounding
# makes equality scale-dependent.
ROUND_DECIMALS = 2
CUM_ROUND_DECIMALS = 2
# growth is a FRACTION (pp change); 2dp would quantize a 0.4% move to 0
GROWTH_ROUND_DECIMALS = 6


@dataclass(frozen=True)
class MetricQueryRequest:
    """The reference CLI's option surface (`dbt_query.py:55-86`)."""
    metrics: tuple[str, ...]
    group_by: tuple[str, ...] = ()
    where: str | None = None
    start_time: dt.datetime | str | None = None
    end_time: dt.datetime | str | None = None
    order_by: tuple[str, ...] = ()  # "-name" = descending
    limit: int | None = None


@dataclass
class CompiledQuery:
    request: MetricQueryRequest
    sql: str
    dataflow_text: str
    df: DataFrame | None = None
    tables: tuple[str, ...] = ()


def _ts_literal(v: dt.datetime | str) -> str:
    if isinstance(v, dt.datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
    return f"TIMESTAMP '{v}'"


def _agged_measure(reg: Registry, metric, measure_name: str) -> str:
    model = reg.models[metric.model]
    measure = next(m for m in model.measures if m.name == measure_name)
    expr = measure.expr
    if metric.filter_sql:
        expr = f"CASE WHEN {metric.filter_sql} THEN {expr} END"
    agg = measure.agg.upper()
    if agg == "COUNT_DISTINCT":
        return f"COUNT(DISTINCT {expr})"
    return f"{agg}({expr})"


def _metric_select(
    reg: Registry,
    name: str,
    time_aliases: tuple[str, ...] = (),
    other_aliases: tuple[str, ...] = (),
) -> str:
    """One SELECT item per metric.

    simple:      ROUND(AGG(expr), 6)
    ratio:       ROUND(AGG(num) / AGG(den), 6) — both aggregate in
                 the same grouped pass, no extra scan
    cumulative:  ROUND(SUM(AGG(expr)) OVER (PARTITION BY non-time
                 dims ORDER BY time dims), 6) — a window over the
                 grouped rows, so the running total costs one extra
                 sort of the (small) aggregate output, never a
                 second pass over the fact table
    """
    metric = reg.metric(name)
    if metric.metric_type == "derived":
        return _derived_select(reg, metric, time_aliases, other_aliases)
    agged = _agged_measure(reg, metric, metric.measure)
    if metric.metric_type == "ratio":
        if metric.denominator is None:
            raise ValueError(f"ratio metric {name} needs a denominator")
        den = _agged_measure(reg, metric, metric.denominator)
        return f"ROUND({agged} / {den}, {ROUND_DECIMALS}) AS {name}"
    if metric.metric_type in ("cumulative", "growth"):
        if not time_aliases:
            raise ValueError(
                f"{metric.metric_type} metric {name} requires a "
                "time-grained group-by dimension (e.g. shipdate__month)"
            )
        partition = (
            "PARTITION BY " + ", ".join(other_aliases) + " "
            if other_aliases
            else ""
        )
        window = f"OVER ({partition}ORDER BY {', '.join(time_aliases)})"
        if metric.metric_type == "growth":
            # period-over-period fractional change; first period (no
            # prior row) is NULL in both engines. Same windowed-over-
            # the-aggregate shape as cumulative: one extra sort of the
            # grouped rows, never a second fact scan. The CASE shell
            # normalizes IEEE negative zero: a tiny negative change
            # rounds to -0.0, which Spark's BigDecimal ROUND
            # canonicalizes to 0.0 but DuckDB keeps; -0.0 = 0 is TRUE
            # in SQL so both engines emit +0.0, while a NULL first
            # period falls to the ELSE branch and stays NULL.
            lagged = f"LAG({agged}) {window}"
            rounded = (
                f"ROUND(({agged} - {lagged}) / {lagged}, "
                f"{GROWTH_ROUND_DECIMALS})"
            )
            return (
                f"CASE WHEN {rounded} = 0 THEN 0.0 "
                f"ELSE {rounded} END AS {name}"
            )
        return f"ROUND(SUM({agged}) {window}, {CUM_ROUND_DECIMALS}) AS {name}"
    agg = next(
        m for m in reg.models[metric.model].measures if m.name == metric.measure
    ).agg.upper()
    if agg in ("SUM", "AVG"):
        agged = f"ROUND({agged}, {ROUND_DECIMALS})"
    return f"{agged} AS {name}"


def _derived_select(
    reg: Registry,
    metric,
    time_aliases: tuple[str, ...],
    other_aliases: tuple[str, ...],
) -> str:
    """derived: ROUND(expr with each input metric name replaced by
    that metric's rendered expression, ROUND_DECIMALS). The inputs
    inline into the SAME grouped SELECT (word-boundary substitution,
    longest name first so ``revenue`` can't clobber
    ``gross_revenue``), so a derived metric is one more projection
    over the single fact pass — never a second scan or a self-join
    of the aggregate. Window-typed inputs (cumulative/growth) are
    rejected: nesting a window inside arithmetic that itself renders
    per-engine is where cross-engine float determinism dies."""
    if not metric.expr or not metric.inputs:
        raise ValueError(f"derived metric {metric.name} needs expr + inputs")
    rendered: dict[str, str] = {}
    for in_name in metric.inputs:
        m = reg.metric(in_name)
        if m.metric_type not in ("simple", "ratio"):
            raise ValueError(
                f"derived metric {metric.name}: input {in_name} has "
                f"window type {m.metric_type!r}; only simple/ratio "
                "metrics can inline"
            )
        item = _metric_select(reg, in_name, time_aliases, other_aliases)
        rendered[in_name] = "(" + item.rsplit(" AS ", 1)[0] + ")"
    pattern = re.compile(
        r"\b("
        + "|".join(re.escape(n) for n in sorted(rendered, key=len, reverse=True))
        + r")\b"
    )
    body = pattern.sub(lambda mt: rendered[mt.group(1)], metric.expr)
    return f"ROUND({body}, {ROUND_DECIMALS}) AS {metric.name}"


@dataclass
class _JoinStep:
    entity: str
    table: str
    left_col: str
    right_col: str


def compile_request(
    request: MetricQueryRequest,
    registry: Registry | None = None,
) -> CompiledQuery:
    """Resolve names → emit SQL + dataflow text. Pure metadata; no
    SparkSession needed (mirrors `dump_queries` which renders SQL
    without executing, `dbt_query2.py:63-80`)."""
    reg = registry or default_registry()
    if not request.metrics:
        raise ValueError("at least one metric required")
    fact_models = {reg.metric(m).model for m in request.metrics}
    if len(fact_models) > 1:
        raise ValueError(
            f"metrics span multiple models {sorted(fact_models)}; "
            "one model per request in v1"
        )
    fact = reg.models[fact_models.pop()]

    # resolve group-by dimensions → (model, dim) and join steps;
    # a `dim__grain` suffix compiles to a date_trunc bucket (the
    # MetricFlow granularity surface, `dbt_query2.py:39-40`
    # granularity_free_qualified_name inverted)
    dims: list[tuple[str, str, str]] = []  # (alias, column_ref, model)
    time_aliases: list[str] = []
    join_steps: list[_JoinStep] = []
    joined: set[str] = set()
    for gname in request.group_by:
        base, _, grain = gname.partition("__")
        if grain and grain not in TIME_GRAINS:
            raise ValueError(
                f"unknown time grain {grain!r}; one of {TIME_GRAINS}"
            )
        model_name, dim = reg.resolve_dimension(base)
        if model_name != fact.name:
            for entity in reg.join_path(fact.name, model_name):
                target = reg.entity_targets[entity]
                if target in joined:
                    continue
                joined.add(target)
                lcol, rcol = ENTITY_JOIN_KEYS[entity]
                join_steps.append(
                    _JoinStep(entity, reg.models[target].table, lcol, rcol)
                )
        if grain:
            if dim.dim_type != "time":
                raise ValueError(
                    f"grain {grain!r} on non-time dimension {base!r}"
                )
            # date_trunc yields TIMESTAMP for the fixture's
            # timestamp-typed time dimensions in both engines
            col = f"date_trunc('{grain}', {dim.column})"
            alias = f"{dim.name}__{grain}"
            time_aliases.append(alias)
        else:
            col, alias = dim.column, dim.name
            if dim.dim_type == "time":
                time_aliases.append(alias)
        dims.append((alias, col, model_name))

    conv = [
        m for m in request.metrics
        if reg.metric(m).metric_type == "conversion"
    ]
    if conv:
        if len(request.metrics) != 1:
            raise ValueError(
                "a conversion metric compiles alone (it is a funnel "
                "pipeline, not a grouped select item)"
            )
        if join_steps:
            raise ValueError(
                "conversion metrics group by dimensions of their own "
                "model only in v1 (no join hops)"
            )
        return _compile_conversion(reg, request, fact, dims, conv[0])

    # the cumulative window must reference grouping EXPRESSIONS —
    # select-list aliases don't resolve inside a window in Spark
    time_exprs = tuple(c for a, c, _ in dims if a in time_aliases)
    other_exprs = tuple(c for a, c, _ in dims if a not in time_aliases)
    select_parts = [f"{col} AS {alias}" for alias, col, _ in dims]
    select_parts += [
        _metric_select(reg, m, time_exprs, other_exprs)
        for m in request.metrics
    ]

    where_parts: list[str] = []
    if request.start_time is not None or request.end_time is not None:
        tcol = fact.time_dimension
        if tcol is None:
            raise ValueError(f"model {fact.name} has no time dimension")
        if request.start_time is not None:
            where_parts.append(f"{tcol} >= {_ts_literal(request.start_time)}")
        if request.end_time is not None:
            where_parts.append(f"{tcol} <= {_ts_literal(request.end_time)}")
    if request.where:
        where_parts.append(f"({request.where})")

    # hint only models declared broadcast-safe at ANY scale (fixed-
    # cardinality dims like nation/region); fact-sized hops are left
    # to Catalyst/AQE size statistics, which broadcast them at small
    # SF and shuffle-join them when they outgrow the threshold
    bcast = [
        s.table
        for s in join_steps
        if reg.models[reg.entity_targets[s.entity]].broadcastable
    ]
    hint = ""
    if bcast:
        hint = " /*+ BROADCAST(" + ", ".join(bcast) + ") */"
    lines = [f"SELECT{hint}"]
    lines.append("    " + ",\n    ".join(select_parts))
    lines.append(f"FROM {fact.table}")
    for s in join_steps:
        lines.append(f"JOIN {s.table} ON {s.left_col} = {s.right_col}")
    if where_parts:
        lines.append("WHERE " + "\n  AND ".join(where_parts))
    if dims:
        lines.append("GROUP BY " + ", ".join(alias for alias, _, _ in dims))
    order_sql: list[str] = []
    for o in request.order_by:
        if o.startswith("-"):
            order_sql.append(f"{o[1:]} DESC")
        else:
            order_sql.append(f"{o} ASC")
    if order_sql:
        lines.append("ORDER BY " + ", ".join(order_sql))
    if request.limit is not None:
        lines.append(f"LIMIT {request.limit}")
    sql = "\n".join(lines)

    # dataflow plan text (the structure_text() surface)
    plan = []
    indent = 0
    def node(text: str) -> None:
        nonlocal indent
        plan.append("  " * indent + f"<{text}>")
        indent += 1
    if request.limit is not None or order_sql:
        node(f"OrderLimitNode order={list(request.order_by)} limit={request.limit}")
    node(
        "AggregateNode metrics="
        + str(list(request.metrics))
        + " dims="
        + str([a for a, _, _ in dims])
    )
    for s in reversed(join_steps):
        node(f"JoinNode entity={s.entity} table={s.table} on {s.left_col}={s.right_col}")
    if where_parts:
        node(f"FilterNode {' AND '.join(where_parts)}")
    node(f"ScanNode table={fact.table}")
    dataflow = "\n".join(plan)

    tables = (fact.table, *(s.table for s in join_steps))
    return CompiledQuery(request, sql, dataflow, tables=tables)


def _compile_conversion(
    reg: Registry,
    request: MetricQueryRequest,
    fact,
    dims: list[tuple[str, str, str]],
    name: str,
) -> CompiledQuery:
    """MetricFlow conversion-metric compilation: of the base events
    (``base_filter``), the fraction followed by a conversion event
    (``conversion_filter``) for the SAME ``conversion_entity`` within
    ``conversion_window_days`` — the funnel-rate class
    (view→purchase, signup→activation).

    SQL shape (runs verbatim on Spark and DuckDB, so the compiled
    text is its own oracle like every other compiled metric):
    base and conversion selections are two filtered scans; the match
    is an entity equi-join with the window as a range predicate; a
    DISTINCT on the base event key de-duplicates multi-conversion
    matches (MetricFlow counts a base event AT MOST once); the final
    grouped pass counts opportunities and conversions as BIGINTs and
    emits the rate as a correctly-rounded IEEE division of exact
    integers (engine-portable).

    Scale shape: both scans push their event_type filter into
    parquet; the match join shuffles on the entity key (the event
    log's natural key) with the window applied pre-shuffle-output;
    DISTINCT reuses the base-key partitioning; no self-join of the
    unfiltered log ever happens. At 100 TB the conversion side is
    typically the small side (purchases ≪ views) and AQE broadcasts
    it."""
    metric = reg.metric(name)
    if not (
        metric.base_filter
        and metric.conversion_filter
        and metric.conversion_entity
    ):
        raise ValueError(
            f"conversion metric {name} needs base_filter, "
            "conversion_filter and conversion_entity"
        )
    tcol = fact.time_dimension
    if tcol is None:
        raise ValueError(f"model {fact.name} has no time dimension")
    ent = metric.conversion_entity
    win = metric.conversion_window_days

    where_parts = [f"({metric.base_filter})"]
    if request.start_time is not None:
        where_parts.append(f"{tcol} >= {_ts_literal(request.start_time)}")
    if request.end_time is not None:
        where_parts.append(f"{tcol} <= {_ts_literal(request.end_time)}")
    if request.where:
        where_parts.append(f"({request.where})")

    dim_cols = "".join(f", {col} AS {alias}" for alias, col, _ in dims)
    dim_select = "".join(f"{alias}, " for alias, _, _ in dims)
    group = (
        "GROUP BY " + ", ".join(a for a, _, _ in dims) + "\n" if dims else ""
    )
    order_sql = [
        f"{o[1:]} DESC" if o.startswith("-") else f"{o} ASC"
        for o in request.order_by
    ]
    order = "ORDER BY " + ", ".join(order_sql) + "\n" if order_sql else ""
    limit = f"LIMIT {request.limit}\n" if request.limit is not None else ""
    sql = (
        f"WITH base AS (\n"
        f"    SELECT {ent}, {tcol} AS base_ts{dim_cols}\n"
        f"    FROM {fact.table}\n"
        f"    WHERE " + "\n      AND ".join(where_parts) + "\n"
        f"),\n"
        f"conv AS (\n"
        f"    SELECT {ent}, {tcol} AS conv_ts\n"
        f"    FROM {fact.table}\n"
        f"    WHERE ({metric.conversion_filter})\n"
        f"),\n"
        f"converted AS (\n"
        f"    SELECT DISTINCT b.{ent}, b.base_ts\n"
        f"    FROM base b JOIN conv c\n"
        f"      ON b.{ent} = c.{ent}\n"
        f"     AND c.conv_ts >= b.base_ts\n"
        f"     AND c.conv_ts <= b.base_ts + INTERVAL {win} DAY\n"
        f")\n"
        f"SELECT {dim_select}"
        f"CAST(COUNT(*) AS BIGINT) AS {name}_opportunities,\n"
        f"       CAST(COUNT(cv.base_ts) AS BIGINT) AS {name}_conversions,\n"
        # CAST, not `* 1.0`: Spark types a 1.0 literal as DECIMAL(2,1)
        # and would return a decimal rate where DuckDB returns double
        f"       ROUND(CAST(COUNT(cv.base_ts) AS DOUBLE) / COUNT(*), "
        f"{GROWTH_ROUND_DECIMALS}) AS {name}\n"
        f"FROM base b LEFT JOIN converted cv\n"
        f"  ON b.{ent} = cv.{ent} AND b.base_ts = cv.base_ts\n"
        f"{group}{order}{limit}".rstrip()
    )
    dataflow = "\n".join(
        [
            f"<AggregateNode metrics=['{name}'] dims="
            + str([a for a, _, _ in dims])
            + ">",
            f"  <ConversionJoinNode entity={ent} window={win}d>",
            f"    <FilterNode {metric.base_filter}>",
            f"      <ScanNode table={fact.table}>",
            f"    <FilterNode {metric.conversion_filter}>",
            f"      <ScanNode table={fact.table}>",
        ]
    )
    return CompiledQuery(request, sql, dataflow, tables=(fact.table,))


def compile_dimension_sweep(
    metric_name: str,
    registry: Registry | None = None,
) -> CompiledQuery:
    """One-pass per-dimension sweep: the metric grouped by EACH of
    its model's own dimensions, as a single GROUPING SETS query.

    The reference's per-dimension loop (`dbt_query.py:166-177`;
    `dbt_query2.py:42-80`) issues one warehouse query per dimension
    — N scans of the fact table. GROUPING SETS computes all N
    groupings in one scan with shared partial aggregation; at 100 TB
    that is N-1 fewer passes over the data. Time dimensions sweep at
    month grain. Each output row carries a ``grouping_dim`` label
    (which sweep the row belongs to), the dimension value as a
    string (types unify across sets), and the metric.
    """
    reg = registry or default_registry()
    metric = reg.metric(metric_name)
    model = reg.models[metric.model]
    sweeps: list[tuple[str, str]] = []  # (alias, column expr)
    for d in model.dimensions:
        if d.dim_type == "time":
            # DATE cast before the string cast: DuckDB's month-grain
            # date_trunc yields DATE where Spark yields TIMESTAMP —
            # stringified they'd render differently
            sweeps.append(
                (
                    f"{d.name}__month",
                    f"CAST(date_trunc('month', {d.column}) AS DATE)",
                )
            )
        else:
            sweeps.append((d.name, d.column))
    if not sweeps:
        raise ValueError(f"model {model.name} has no dimensions to sweep")
    select_dims = [f"CAST({col} AS STRING) AS {alias}" for alias, col in sweeps]
    label = "CASE " + " ".join(
        f"WHEN GROUPING({col}) = 0 THEN '{alias}'"
        for alias, col in sweeps
    ) + " END"
    sql = "\n".join(
        [
            "SELECT",
            f"    {label} AS grouping_dim,",
            "    " + ",\n    ".join(select_dims) + ",",
            f"    {_metric_select(reg, metric_name)}",
            f"FROM {model.table}",
            "GROUP BY GROUPING SETS ("
            + ", ".join(f"({col})" for _, col in sweeps)
            + ")",
        ]
    )
    dataflow = (
        f"<SweepNode metric={metric_name} dims="
        f"{[a for a, _ in sweeps]}>\n  <ScanNode table={model.table}>"
    )
    req = MetricQueryRequest(metrics=(metric_name,))
    return CompiledQuery(req, sql, dataflow, tables=(model.table,))


def execute(
    spark: SparkSession,
    sf_dir: str,
    request: MetricQueryRequest,
    registry: Registry | None = None,
) -> CompiledQuery:
    """Compile and run: registers the needed fixture tables as views
    and executes the rendered SQL through Catalyst."""
    from dbt_eamples_spark.catalog import register_tables

    compiled = compile_request(request, registry)
    register_tables(spark, sf_dir)
    compiled.df = spark.sql(compiled.sql)
    return compiled


def explain_text(spark: SparkSession, compiled: CompiledQuery) -> str:
    """Physical plan text (the ``--explain`` surface,
    `dbt_query.py:100-126`: rendered SQL + plan)."""
    rows = spark.sql("EXPLAIN FORMATTED " + compiled.sql).collect()
    return "\n".join(r[0] for r in rows)


def _dataflow_nodes(compiled: CompiledQuery) -> list[str]:
    """The dataflow chain as labels, scan-first (execution order)."""
    labels = [
        line.strip().removeprefix("<").removesuffix(">")
        for line in compiled.dataflow_text.splitlines()
        if line.strip()
    ]
    return list(reversed(labels))  # text prints sink-first


def dataflow_dot(compiled: CompiledQuery) -> str:
    """Graphviz DOT of the compiled dataflow plan — the portable
    form of the reference's plan-DAG artifact (dbt_query.py:127-132
    renders the MetricFlow dataflow to SVG and displays it)."""
    nodes = _dataflow_nodes(compiled)
    out = ["digraph dataflow {", "  rankdir=TB;", "  node [shape=box];"]
    for i, label in enumerate(nodes):
        safe = label.replace('"', "'")
        out.append(f'  n{i} [label="{safe}"];')
    for i in range(len(nodes) - 1):
        out.append(f"  n{i} -> n{i + 1};")
    out.append("}")
    return "\n".join(out)


def dataflow_svg(compiled: CompiledQuery) -> str:
    """Dependency-free SVG of the dataflow chain (stacked boxes +
    arrows, scan at the top). The compiled plan is a linear chain,
    so no graph layout engine is needed — parity with the
    reference's `*_plan.svg` artifact (dbt_query.py:150-153)
    without a graphviz binary in the image."""
    nodes = _dataflow_nodes(compiled)
    bw, bh, gap, pad = 640, 34, 26, 10
    width = bw + 2 * pad
    height = pad * 2 + len(nodes) * bh + (len(nodes) - 1) * gap
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="monospace" font-size="12">'
    ]
    for i, label in enumerate(nodes):
        y = pad + i * (bh + gap)
        safe = (
            label.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )
        parts.append(
            f'<rect x="{pad}" y="{y}" width="{bw}" height="{bh}" '
            'fill="none" stroke="black"/>'
        )
        parts.append(
            f'<text x="{pad + 8}" y="{y + 22}">{safe}</text>'
        )
        if i < len(nodes) - 1:
            x = pad + bw // 2
            y1, y2 = y + bh, y + bh + gap
            parts.append(
                f'<line x1="{x}" y1="{y1}" x2="{x}" y2="{y2}" '
                'stroke="black"/>'
            )
            parts.append(
                f'<polygon points="{x - 4},{y2 - 6} {x + 4},{y2 - 6} '
                f'{x},{y2}"/>'
            )
    parts.append("</svg>")
    return "\n".join(parts)

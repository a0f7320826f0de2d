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

from pyspark.sql import DataFrame, SparkSession

from dbt_eamples_spark.plans.semantics import (
    ENTITY_JOIN_KEYS,
    Registry,
    default_registry,
)

ROUND_DECIMALS = 6  # metric rounding inside compiled SQL (oracle parity)


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


def _metric_select(reg: Registry, name: str) -> str:
    metric = reg.metric(name)
    model = reg.models[metric.model]
    measure = next(m for m in model.measures if m.name == metric.measure)
    expr = measure.expr
    if metric.filter_sql:
        expr = f"CASE WHEN {metric.filter_sql} THEN {expr} END"
    agg = measure.agg.upper()
    if agg == "COUNT_DISTINCT":
        agged = f"COUNT(DISTINCT {expr})"
    else:
        agged = f"{agg}({expr})"
    if agg in ("SUM", "AVG"):
        agged = f"ROUND({agged}, {ROUND_DECIMALS})"
    return f"{agged} AS {name}"


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

    # resolve group-by dimensions → (model, dim) and join steps
    dims: list[tuple[str, str, str]] = []  # (alias, column_ref, model)
    join_steps: list[_JoinStep] = []
    joined: set[str] = set()
    for gname in request.group_by:
        model_name, dim = reg.resolve_dimension(gname)
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
        dims.append((dim.name, dim.column, model_name))

    select_parts = [f"{col} AS {alias}" for alias, col, _ in dims]
    select_parts += [_metric_select(reg, m) for m in request.metrics]

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

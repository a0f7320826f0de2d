"""Saved (named) metric queries — the ``--saved-query`` surface of
the reference CLI (`/root/reference/dbt_query.py:64-66`: a preset
name resolving to a full query spec instead of spelling out
metrics/group-by/filters each run).

The registry doubles as the driver contract's compiled-metric-layer
entries (``__spark_entry__.METRIC_REQUESTS``), so
``cli query --saved-query metric_compiled_star`` returns exactly the
frame the driver checks against the DuckDB oracle.
"""

from __future__ import annotations

from dbt_eamples_spark.plans.compiler import MetricQueryRequest

SAVED_QUERIES: dict[str, MetricQueryRequest] = {
    "metric_compiled_star": MetricQueryRequest(
        metrics=("revenue", "quantity"),
        group_by=("nation_name", "region_name"),
        start_time="1995-01-01 00:00:00",
        end_time="1997-12-31 00:00:00",
    ),
    "metric_compiled_filtered": MetricQueryRequest(
        metrics=("order_count", "urgent_order_count", "order_total"),
        group_by=("orderstatus",),
    ),
    "metric_compiled_monthly": MetricQueryRequest(
        metrics=("revenue", "revenue_per_item"),
        group_by=("returnflag", "shipdate__month"),
    ),
    "metric_compiled_cumulative": MetricQueryRequest(
        metrics=("revenue", "cum_revenue"),
        group_by=("shipdate__month",),
    ),
    "metric_compiled_growth": MetricQueryRequest(
        metrics=("revenue", "revenue_growth"),
        group_by=("returnflag", "shipdate__month"),
    ),
    "metric_compiled_derived": MetricQueryRequest(
        metrics=("gross_revenue", "revenue", "discount_amount"),
        group_by=("returnflag", "linestatus"),
    ),
    "metric_compiled_conversion": MetricQueryRequest(
        metrics=("view_to_purchase",),
        group_by=("event_time__day",),
    ),
    "metric_compiled_topk": MetricQueryRequest(
        metrics=("order_total",),
        group_by=("mktsegment", "orderpriority"),
        where="o_totalprice > 1000",
        order_by=("-order_total", "mktsegment", "orderpriority"),
        limit=10,
    ),
}

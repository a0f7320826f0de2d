"""Semantic-model registry (SURVEY.md M2; reference lifecycle §3.1/§3.2).

The reference's semantic layer lives in the external MetricFlow
library: metrics own dimension lists (`dbt_query2.py:39-40`),
dimensions belong to semantic models (`dbt_query2.py:36-37,53-58`),
and "accompanying dimensions" are the other dimensions of the owning
model (`dbt_query2.py:52-60`). This module supplies those structures
natively: a registry of semantic models (table, entities, dimensions,
measures) and metrics compiled against it.

The default registry describes the fixture star schema, with the
lineitem/orders fact models linked to the customer→nation→region
dimension chain through entities (join keys).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Entity:
    """A join key: links a fact model to a dimension model."""
    name: str
    column: str


@dataclass(frozen=True)
class Dimension:
    name: str
    column: str
    dim_type: str = "categorical"  # or "time"


@dataclass(frozen=True)
class Measure:
    name: str
    expr: str  # SQL expression over the model's table
    agg: str = "sum"  # sum | count | avg | min | max | count_distinct


@dataclass(frozen=True)
class SemanticModel:
    name: str
    table: str
    entities: tuple[Entity, ...] = ()
    dimensions: tuple[Dimension, ...] = ()
    measures: tuple[Measure, ...] = ()
    # time dimension used for start/end constraints
    time_dimension: str | None = None
    # size class: True for genuinely small dimension tables (safe to
    # hint BROADCAST at any data scale); False for fact-sized models
    # (orders, lineitem) where the compiler must leave join strategy
    # to Catalyst/AQE size statistics — a hard-coded broadcast hint
    # that is right at sf0.1 forces an OOM plan at 100 TB
    broadcastable: bool = True

    def dimension(self, name: str) -> Dimension | None:
        for d in self.dimensions:
            if d.name == name:
                return d
        return None


@dataclass(frozen=True)
class Metric:
    """A named aggregation over one model's measure, optionally
    filtered (the MetricFlow metric the CLI queries by name).

    ``metric_type``: "simple" (one aggregated measure), "ratio"
    (aggregated ``measure`` / aggregated ``denominator``),
    "cumulative" (running total of the aggregated measure over the
    request's time dimension — the MetricFlow cumulative class),
    "growth" (period-over-period fractional change via LAG over the
    request's time grain — the MetricFlow offset class, `metric_time`
    offset window of 1 grain), "derived" (an arithmetic ``expr``
    over other metrics by name — the MetricFlow derived class; the
    input metrics' expressions inline into one grouped pass, so a
    derived metric never costs a second fact scan), or "conversion"
    (the MetricFlow conversion class: of the base events selected by
    ``base_filter``, the fraction followed by a ``conversion_filter``
    event for the same ``conversion_entity`` within
    ``conversion_window_days``)."""
    name: str
    model: str
    measure: str
    description: str = ""
    filter_sql: str | None = None
    # simple | ratio | cumulative | growth | derived | conversion
    metric_type: str = "simple"
    denominator: str | None = None  # measure name, ratio only
    expr: str | None = None  # derived only: expr over metric names
    inputs: tuple[str, ...] = ()  # derived only: referenced metrics
    # conversion only:
    base_filter: str | None = None  # SQL picking the base events
    conversion_filter: str | None = None  # SQL picking conversions
    conversion_entity: str | None = None  # join column (e.g. user_id)
    conversion_window_days: int = 7


# time-dimension granularities accepted as `dim__grain` group-bys
TIME_GRAINS = ("year", "quarter", "month", "week", "day")


@dataclass
class Registry:
    models: dict[str, SemanticModel] = field(default_factory=dict)
    metrics: dict[str, Metric] = field(default_factory=dict)
    # entity name → (model that owns the entity's dimension side)
    entity_targets: dict[str, str] = field(default_factory=dict)

    def add_model(self, m: SemanticModel) -> None:
        self.models[m.name] = m

    def add_metric(self, m: Metric) -> None:
        if m.model not in self.models:
            raise KeyError(f"metric {m.name}: unknown model {m.model}")
        self.metrics[m.name] = m

    def metric(self, name: str) -> Metric:
        if name not in self.metrics:
            raise KeyError(
                f"metric {name!r} not found; available: {sorted(self.metrics)}"
            )
        return self.metrics[name]

    def list_metrics(self) -> list[str]:
        """`cfg.mf.list_metrics()` equivalent (dbt_query2.py:24-32)."""
        return sorted(self.metrics)

    def reachable_models(self, model_name: str) -> list[str]:
        """Models reachable from ``model_name`` over entity links
        (BFS order) — the join universe of a fact model."""
        out: list[str] = []
        seen = {model_name}
        frontier = [model_name]
        while frontier:
            cur = frontier.pop(0)
            for e in self.models[cur].entities:
                target = self.entity_targets.get(e.name)
                if target and target not in seen:
                    seen.add(target)
                    out.append(target)
                    frontier.append(target)
        return out

    def join_path(self, model_name: str, target: str) -> list[str]:
        """Entity names forming the join chain fact → target model."""
        parents: dict[str, tuple[str, str]] = {}  # model -> (via_model, entity)
        seen = {model_name}
        frontier = [model_name]
        while frontier:
            cur = frontier.pop(0)
            for e in self.models[cur].entities:
                t = self.entity_targets.get(e.name)
                if t and t not in seen:
                    seen.add(t)
                    parents[t] = (cur, e.name)
                    frontier.append(t)
        if target not in parents:
            raise KeyError(f"no join path from {model_name} to {target}")
        path: list[str] = []
        cur = target
        while cur != model_name:
            via, entity = parents[cur]
            path.append(entity)
            cur = via
        return list(reversed(path))

    def dimensions_for_metric(self, metric_name: str) -> list[str]:
        """All dimensions reachable from the metric's model: its own
        plus those of entity-linked dimension models, qualified as
        ``model.dimension`` (the granularity-free qualified names of
        `dbt_query.py:166-167`)."""
        metric = self.metric(metric_name)
        model = self.models[metric.model]
        out = [f"{model.name}.{d.name}" for d in model.dimensions]
        for m in self.reachable_models(model.name):
            out.extend(f"{m}.{d.name}" for d in self.models[m].dimensions)
        return out

    def resolve_dimension(self, name: str) -> tuple[str, Dimension]:
        """Resolve a bare or ``model.dim`` qualified dimension name.
        Bare names resolve when globally unique (the reference's
        uniqueness assumption, `dbt_query2.py:58`)."""
        if "." in name:
            model_name, _, dim_name = name.partition(".")
            model = self.models[model_name]
            d = model.dimension(dim_name)
            if d is None:
                raise KeyError(f"dimension {dim_name!r} not in model {model_name}")
            return model_name, d
        owners = [
            (m.name, d)
            for m in self.models.values()
            for d in m.dimensions
            if d.name == name
        ]
        if not owners:
            raise KeyError(f"dimension {name!r} not found")
        if len(owners) > 1:
            raise KeyError(
                f"dimension {name!r} ambiguous across models "
                f"{[m for m, _ in owners]}; qualify as model.dim"
            )
        return owners[0]

    def accompanying_dimensions(self, qualified_dim: str) -> list[str]:
        """The other dimensions of the model owning ``qualified_dim``
        (`dbt_query2.py:52-60` collects all dims of the matching
        semantic model)."""
        model_name, _, dim = qualified_dim.partition(".")
        model = self.models[model_name]
        return [f"{model.name}.{d.name}" for d in model.dimensions if d.name != dim]


def default_registry() -> Registry:
    """Fixture star schema as semantic models."""
    reg = Registry()
    reg.add_model(
        SemanticModel(
            name="lineitem",
            table="lineitem",
            entities=(Entity("order", "l_orderkey"),),
            dimensions=(
                Dimension("returnflag", "l_returnflag"),
                Dimension("linestatus", "l_linestatus"),
                Dimension("shipdate", "l_shipdate", "time"),
            ),
            measures=(
                Measure("revenue", "l_extendedprice * (1 - l_discount)", "sum"),
                Measure("gross_revenue", "l_extendedprice", "sum"),
                Measure("quantity", "l_quantity", "sum"),
                Measure("items", "1", "count"),
            ),
            time_dimension="l_shipdate",
            broadcastable=False,
        )
    )
    reg.add_model(
        SemanticModel(
            name="orders",
            table="orders",
            entities=(Entity("customer", "o_custkey"),),
            dimensions=(
                Dimension("orderstatus", "o_orderstatus"),
                Dimension("orderpriority", "o_orderpriority"),
                Dimension("orderdate", "o_orderdate", "time"),
            ),
            measures=(
                Measure("order_total", "o_totalprice", "sum"),
                Measure("order_count", "1", "count"),
                Measure("avg_order_value", "o_totalprice", "avg"),
            ),
            time_dimension="o_orderdate",
            broadcastable=False,
        )
    )
    reg.add_model(
        SemanticModel(
            name="customer",
            table="customer",
            entities=(Entity("nation", "c_nationkey"),),
            dimensions=(
                Dimension("mktsegment", "c_mktsegment"),
                Dimension("name", "c_name"),
            ),
            measures=(Measure("acctbal_total", "c_acctbal", "sum"),),
            # scales linearly with the corpus (TPC-H customer ~SF ×
            # 150k rows) — too big to broadcast at cluster scale
            broadcastable=False,
        )
    )
    reg.add_model(
        SemanticModel(
            name="nation",
            table="nation",
            entities=(Entity("region", "n_regionkey"),),
            dimensions=(Dimension("nation_name", "n_name"),),
        )
    )
    reg.add_model(
        SemanticModel(
            name="region",
            table="region",
            dimensions=(Dimension("region_name", "r_name"),),
        )
    )
    reg.add_model(
        SemanticModel(
            name="events",
            table="events",
            dimensions=(
                Dimension("event_type", "event_type"),
                Dimension("event_time", "ts", "time"),
            ),
            measures=(Measure("event_count", "1", "count"),),
            time_dimension="ts",
            broadcastable=False,
        )
    )
    # entity → dimension-side model + join key column there
    reg.entity_targets = {
        "order": "orders",
        "customer": "customer",
        "nation": "nation",
        "region": "region",
    }
    reg.add_metric(Metric("revenue", "lineitem", "revenue", "discounted revenue"))
    reg.add_metric(Metric("quantity", "lineitem", "quantity", "total quantity"))
    reg.add_metric(Metric("items", "lineitem", "items", "lineitem count"))
    reg.add_metric(Metric("order_total", "orders", "order_total", "gross order value"))
    reg.add_metric(Metric("order_count", "orders", "order_count", "order count"))
    reg.add_metric(
        Metric("avg_order_value", "orders", "avg_order_value", "average order value")
    )
    reg.add_metric(
        Metric(
            "urgent_order_count",
            "orders",
            "order_count",
            "orders with 1-URGENT priority",
            filter_sql="o_orderpriority = '1-URGENT'",
        )
    )
    reg.add_metric(
        Metric(
            "revenue_per_item",
            "lineitem",
            "revenue",
            "discounted revenue per lineitem",
            metric_type="ratio",
            denominator="items",
        )
    )
    reg.add_metric(
        Metric(
            "cum_revenue",
            "lineitem",
            "revenue",
            "running revenue over the request time grain",
            metric_type="cumulative",
        )
    )
    reg.add_metric(
        Metric("gross_revenue", "lineitem", "gross_revenue", "undiscounted revenue")
    )
    reg.add_metric(
        Metric(
            "discount_amount",
            "lineitem",
            "revenue",  # unused by the derived branch; kept for model binding
            "revenue given up to discounts (gross minus net)",
            metric_type="derived",
            expr="gross_revenue - revenue",
            inputs=("gross_revenue", "revenue"),
        )
    )
    reg.add_metric(
        Metric(
            "revenue_growth",
            "lineitem",
            "revenue",
            "period-over-period fractional revenue change",
            metric_type="growth",
        )
    )
    reg.add_metric(Metric("event_count", "events", "event_count", "event count"))
    reg.add_metric(
        Metric(
            "view_to_purchase",
            "events",
            "event_count",
            "7-day view→purchase conversion rate per user",
            metric_type="conversion",
            base_filter="event_type = 'view'",
            conversion_filter="event_type = 'purchase'",
            conversion_entity="user_id",
            conversion_window_days=7,
        )
    )
    return reg


# entity name → (fact-side column, dimension-side column)
ENTITY_JOIN_KEYS = {
    "order": ("l_orderkey", "o_orderkey"),
    "customer": ("o_custkey", "c_custkey"),
    "nation": ("c_nationkey", "n_nationkey"),
    "region": ("n_regionkey", "r_regionkey"),
}

"""Skew mitigation: salted joins (BASELINE.json scale posture;
complements AQE's runtime skew-join splitting, which only triggers
on sort-merge joins — a salted broadcast/hash join handles the
"one key is 30% of the fact table" case AQE can't rebalance).

Semantics are identical to a plain equi-join — asserted against the
un-salted plan by the driver oracle — only the physical key
distribution changes: the fact side's hot key rows scatter across
``n_salts`` sub-keys, and the (small) build side replicates
``n_salts``× so every sub-key still finds its match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table

N_SALTS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the fact side is salted on a derived sub-key.

    fact rows get ``salt = pmod(hash(<all fact cols>), n)`` —
    deterministic, so re-runs partition identically; dim rows
    replicate once per salt via a small ``explode``. The joined
    output drops the salt, so the result equals ``fact.join(dim,
    key, how)`` row-for-row. Use when one key dominates the fact
    table; the hot key's rows now spread over ``n_salts`` shuffle
    partitions/tasks instead of one straggler.
    """
    fact_cols = fact.columns
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in fact_cols]), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    joined = salted_fact.join(salted_dim, on=[key, "_salt"], how=how)
    return joined.drop("_salt")


def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract query: events ⋈ per-user order counts with a
    salted key — result must equal the plain join (the oracle runs
    the un-salted SQL)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("u"), "event_type"
    )
    per_user = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("u"))
        .agg(F.count("*").alias("n_orders"))
    )
    out = salted_join(ev, per_user, key="u", how="inner")
    return out.select(
        "event_id",
        F.col("u").alias("user_id"),
        "event_type",
        "n_orders",
    )

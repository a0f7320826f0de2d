"""JDBC source/sink round trip against the in-JVM Derby engine
(bundled with Spark for the Hive metastore, so the test is hermetic —
no network, no external server). In-memory Derby is per-JVM, which is
exactly right for local-mode tests; on a real cluster the URL points
at a warehouse and the same code fans out one connection per
partition."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.sources.jdbc import append_jdbc, read_jdbc

DERBY_URL = "jdbc:derby:memory:jdbc_test;create=true"
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_available(spark) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.derby.iapi.jdbc.AutoloadedDriver")
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby(spark):
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the Spark classpath")
    return DERBY_URL


def test_jdbc_append_and_read_roundtrip(spark, sf_dir, derby):
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    fixed = dt.datetime(2026, 1, 1, 0, 0, 0)
    append_jdbc(nation, derby, "nation_sink", ts=fixed, driver=DERBY_DRIVER)
    back = read_jdbc(spark, derby, "nation_sink", driver=DERBY_DRIVER)
    assert back.count() == nation.count()
    # audit column present, fixed stamp (postgres_client.py:34-48)
    stamps = back.select("insert_dt").distinct().collect()
    assert len(stamps) == 1 and stamps[0][0] == fixed
    # values survive the trip
    orig = {r.n_nationkey: r.n_name for r in nation.collect()}
    got = {r.n_nationkey: r.n_name for r in back.collect()}
    assert got == orig


def test_jdbc_append_appends(spark, sf_dir, derby):
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    fixed = dt.datetime(2026, 1, 1, 0, 0, 0)
    append_jdbc(region, derby, "region_sink", ts=fixed, driver=DERBY_DRIVER)
    append_jdbc(region, derby, "region_sink", ts=fixed, driver=DERBY_DRIVER)
    back = read_jdbc(spark, derby, "region_sink", driver=DERBY_DRIVER)
    assert back.count() == 2 * region.count()


def test_jdbc_partitioned_read_fans_out(spark, sf_dir, derby):
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    append_jdbc(
        customer,
        derby,
        "customer_sink",
        ts=dt.datetime(2026, 1, 1),
        driver=DERBY_DRIVER,
    )
    hi = customer.agg(F.max("c_custkey")).first()[0]
    back = read_jdbc(
        spark,
        derby,
        "customer_sink",
        partition_column="c_custkey",
        lower_bound=1,
        upper_bound=int(hi) + 1,
        num_partitions=4,
        driver=DERBY_DRIVER,
    )
    # the read plans one remote query per stride partition
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == customer.count()


def test_jdbc_predicate_read(spark, sf_dir, derby):
    back = read_jdbc(
        spark,
        derby,
        "customer_sink",
        predicates=['"c_acctbal" >= 0', '"c_acctbal" < 0'],
        driver=DERBY_DRIVER,
    )
    assert back.rdd.getNumPartitions() == 2
    total = load_table(spark, sf_dir, "customer").count()
    assert back.count() == total


def test_jdbc_arg_validation(spark, derby):
    with pytest.raises(ValueError):
        read_jdbc(spark, derby, "t", partition_column="K")
    with pytest.raises(ValueError):
        read_jdbc(
            spark,
            derby,
            "t",
            partition_column="K",
            lower_bound=0,
            upper_bound=1,
            num_partitions=1,
            predicates=["1=1"],
        )


def test_read_jdbc_with_retry_recovers_from_cold_start(spark, derby):
    """First connect attempts fail (warehouse still booting); the
    retry wrapper backs off attempt² and succeeds once the engine
    answers — driver-side connect retry mirroring the reference's
    open() (connections.py:255-281)."""
    from dbt_eamples_spark.sources import connections as C

    sleeps: list[float] = []

    # monkey-wrap read_jdbc via a flaky shim: 2 failures, then real
    import dbt_eamples_spark.sources.jdbc as jdbc_mod

    real = jdbc_mod.read_jdbc
    state = {"fails": 2}

    def flaky(spark_, url, table, **kw):
        if state["fails"] > 0:
            state["fails"] -= 1
            raise ConnectionError("warehouse booting")
        return real(spark_, url, table, **kw)

    jdbc_mod.read_jdbc = flaky
    try:
        df = C.read_jdbc_with_retry(
            spark,
            derby,
            "nation_sink",
            driver=DERBY_DRIVER,
            retries=3,
            sleep=sleeps.append,
        )
        assert df.count() > 0
    finally:
        jdbc_mod.read_jdbc = real
    assert sleeps == [1.0, 4.0]

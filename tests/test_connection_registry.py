"""Named-connection registry (VERDICT r7 #8): get-or-create
idempotence, env-var secret resolution at call time, and an
end-to-end read/append through a registered Derby connection —
hermetic, in-JVM (the test_jdbc harness)."""

from __future__ import annotations

import datetime as dt

import pytest

from dbt_eamples_spark.catalog import load_table
from dbt_eamples_spark.sources.registry import (
    ConnectionRegistry,
    append_jdbc_named,
    read_jdbc_named,
)

DERBY_URL = "jdbc:derby:memory:conn_registry_test;create=true"
DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_available(spark) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(DERBY_DRIVER)
        return True
    except Exception:
        return False


def test_get_or_create_is_idempotent():
    reg = ConnectionRegistry()
    a = reg.create_connection(
        "wh", "jdbc", "jdbc:derby:memory:a", password_env="WH_PW"
    )
    # a rerun with DIFFERENT parameters returns the ORIGINAL binding
    b = reg.create_connection("wh", "jdbc", "jdbc:derby:memory:OTHER")
    assert b is a and b.url == "jdbc:derby:memory:a"
    assert reg.list_ids() == ["wh"]
    reg.drop("wh")
    c = reg.create_connection("wh", "jdbc", "jdbc:derby:memory:OTHER")
    assert c.url == "jdbc:derby:memory:OTHER"


def test_secret_resolves_from_env_at_call_time(monkeypatch):
    reg = ConnectionRegistry()
    conn = reg.create_connection(
        "wh", "jdbc", "jdbc:x", password_env="REG_TEST_PW"
    )
    monkeypatch.delenv("REG_TEST_PW", raising=False)
    assert conn.resolve_password() is None
    monkeypatch.setenv("REG_TEST_PW", "s3cret")
    assert conn.resolve_password() == "s3cret"  # rotation picked up
    # the registry object itself never holds the secret
    assert "s3cret" not in repr(conn)


def test_unknown_conn_id_lists_known():
    reg = ConnectionRegistry()
    reg.create_connection("a", "jdbc", "jdbc:x")
    with pytest.raises(KeyError, match="unknown conn_id 'b'.*'a'"):
        reg.get("b")


def test_non_jdbc_type_rejected(spark):
    reg = ConnectionRegistry()
    reg.create_connection("slack", "slack", "https://hooks.example")
    with pytest.raises(ValueError, match="is 'slack', not jdbc"):
        read_jdbc_named(spark, "slack", "t", registry=reg)


def test_named_roundtrip_through_derby(spark, sf_dir):
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the Spark classpath")
    reg = ConnectionRegistry()
    reg.create_connection(
        "warehouse",
        "jdbc",
        DERBY_URL,
        extra={"driver": DERBY_DRIVER},
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    fixed = dt.datetime(2026, 1, 1, 0, 0, 0)
    append_jdbc_named(
        region, "warehouse", "region_named_sink", registry=reg, ts=fixed
    )
    back = read_jdbc_named(
        spark, "warehouse", "region_named_sink", registry=reg
    )
    assert back.count() == region.count()
    got = {r.r_regionkey: r.r_name for r in back.collect()}
    assert got == {r.r_regionkey: r.r_name for r in region.collect()}

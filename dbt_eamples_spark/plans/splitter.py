"""Multi-statement SQL script execution (SURVEY.md §2.8 F11 / §3.4).

The reference's connection layer splits a SQL buffer at semicolons,
strips comments and empty statements, and treats BEGIN/COMMIT as
warned no-ops before handing each statement to the warehouse cursor
(`connections.py:330-336` split, `:415-427` comment stripping,
`:312-327,395-454` transaction no-ops). Spark SQL is single-statement,
so the engine supplies the same lifecycle: a quote/comment-aware
splitter feeding ``spark.sql`` per statement.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger(__name__)

_TXN_NOOPS = {"begin", "commit", "rollback", "start transaction", "end"}


def split_statements(sql_text: str) -> list[str]:
    """Split a SQL script at top-level semicolons, respecting single
    and double quotes, ``--`` line comments and ``/* */`` block
    comments. Comments are stripped; empty statements dropped."""
    statements: list[str] = []
    buf: list[str] = []
    i, n = 0, len(sql_text)
    in_sq = in_dq = in_line = in_block = False
    while i < n:
        ch = sql_text[i]
        nxt = sql_text[i + 1] if i + 1 < n else ""
        if in_line:
            if ch == "\n":
                in_line = False
                buf.append(ch)
            i += 1
            continue
        if in_block:
            if ch == "*" and nxt == "/":
                in_block = False
                i += 2
            else:
                i += 1
            continue
        if in_sq:
            buf.append(ch)
            if ch == "'":
                if nxt == "'":  # escaped quote
                    buf.append(nxt)
                    i += 1
                else:
                    in_sq = False
            i += 1
            continue
        if in_dq:
            buf.append(ch)
            if ch == '"':
                in_dq = False
            i += 1
            continue
        if ch == "-" and nxt == "-":
            in_line = True
            i += 2
            continue
        if ch == "/" and nxt == "*":
            in_block = True
            # a comment is whitespace: emit one space in its place so
            # the text on either side cannot fuse into a new token
            # (e.g. "*/" + "*/" re-parsing as an unterminated "/*")
            buf.append(" ")
            i += 2
            continue
        if ch == "'":
            in_sq = True
            buf.append(ch)
            i += 1
            continue
        if ch == '"':
            in_dq = True
            buf.append(ch)
            i += 1
            continue
        if ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                statements.append(stmt)
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        statements.append(tail)
    return statements


@dataclass
class StatementStatus:
    sql: str
    status: str  # "ok" | "noop" | "error"
    rows: int | None = None
    error: str | None = None


@dataclass
class ScriptResult:
    statuses: list[StatementStatus] = field(default_factory=list)
    last_df: DataFrame | None = None


def run_script(spark: SparkSession, sql_text: str) -> ScriptResult:
    """Execute a multi-statement script: split → per-statement
    ``spark.sql`` → last result DataFrame + per-statement status.
    BEGIN/COMMIT/ROLLBACK warn and no-op (Spark has no transactions —
    identical observable semantics to `connections.py:312-327`)."""
    result = ScriptResult()
    for stmt in split_statements(sql_text):
        lowered = " ".join(stmt.lower().split())
        if lowered in _TXN_NOOPS:
            log.warning("transaction statement is a no-op: %s", stmt)
            result.statuses.append(StatementStatus(stmt, "noop"))
            continue
        df = spark.sql(stmt)
        result.last_df = df
        result.statuses.append(StatementStatus(stmt, "ok"))
    return result


def multi_statement_exec_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: a script with comments, a no-op BEGIN,
    a temp-view DDL and a final SELECT — returns the last result."""
    from dbt_eamples_spark.catalog import register_tables

    register_tables(spark, sf_dir)
    script = """
        -- incremental revenue report (comment must be stripped)
        BEGIN;
        CREATE OR REPLACE TEMP VIEW _script_orders AS
            SELECT o_orderkey, o_custkey, o_totalprice /* inline */ , o_orderstatus
            FROM orders WHERE o_orderstatus = 'F';
        /* block comment;
           with a semicolon inside */
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM _script_orders
        GROUP BY o_orderstatus;
        COMMIT;
    """
    res = run_script(spark, script)
    assert res.last_df is not None
    return res.last_df

"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry in Spark and its ``oracle_sql()`` in
DuckDB at a given sf dir, then compares: row count, sorted column
names, and order-insensitive values (strict canonical-string hash
plus a tolerant float comparison so we can distinguish "hard
mismatch" from "float-eps risk").

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from dbt_eamples_spark.session import get_spark  # noqa: E402
from dbt_eamples_spark.catalog import TABLES, table_path  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_sig(pdf: pd.DataFrame) -> tuple[int, list[str], str, list[str]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "\x01".join(canon_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    h = hashlib.sha256("\x02".join(rows).encode()).hexdigest()[:16]
    return len(pdf), cols, h, rows


def run(sf_dir: str, only: list[str]) -> int:
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            failures += 1
            continue
        sn, scols, shash, srows = frame_sig(sdf)
        on, ocols, ohash, orows = frame_sig(odf)
        if sn != on:
            print(f"FAIL {name}: rowcount spark={sn} duckdb={on}")
            failures += 1
        elif scols != ocols:
            print(f"FAIL {name}: cols spark={scols} duckdb={ocols}")
            failures += 1
        elif shash != ohash:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: value hash mismatch; first diffs:")
            for a, b in diffs:
                print(f"   spark : {a[:200]}")
                print(f"   duckdb: {b[:200]}")
            failures += 1
        else:
            print(f"OK   {name} ({sn} rows)")
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    sys.exit(1 if run(sf_dir, only) else 0)

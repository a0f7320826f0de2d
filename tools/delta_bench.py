"""Delta-maintenance exponent check (VERDICT r8 #2): time
`ngram_pairs_apply_delta` / `triangle_credits_apply_delta` against a
FIXED base corpus at two delta sizes (4× apart) and report the
delta-size exponent e = log(t_big / t_small) / log(4). The claim
under test: incremental cost scales with the DELTA (plus a constant
index-scan term), not with the corpus — so e stays well under 1 and
absolute times stay far below the full rebuild, which is also timed
for reference.

Usage: python tools/delta_bench.py [SF_DIR]   (default sf0.1)
Writes one JSON line; base dirs/artifacts live under .tmp/delta_bench.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from dbt_eamples_spark.catalog import load_table  # noqa: E402
from dbt_eamples_spark.session import get_spark  # noqa: E402


def _t(fn) -> float:
    t0 = time.time()
    fn().collect()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = "/root/repo/.tmp/delta_bench"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    os.environ["SPARK_GRAFT_ARTIFACTS"] = os.path.join(work, "arts")
    spark = get_spark("delta-bench")

    from dbt_eamples_spark.operators import dedup as D
    from dbt_eamples_spark.operators import graph as G

    out: dict = {"sf_dir": sf_dir, "families": {}}

    # ---- ngram pairs: base = 92% of docs; deltas = 2% and 8% ----
    docs = load_table(spark, sf_dir, "documents")
    b = os.path.join(work, "docs_base")
    os.makedirs(b)
    docs.filter(F.col("doc_id") % 100 >= 8).write.parquet(
        os.path.join(b, "documents.parquet")
    )
    d_small = docs.filter(F.col("doc_id") % 100 < 2).localCheckpoint()
    d_big = docs.filter(F.col("doc_id") % 100 < 8).localCheckpoint()
    t_rebuild = _t(lambda: D._ngram_pairs(spark, sf_dir))
    # warm the base artifacts OUTSIDE the timed region (the daily
    # loop amortizes the base build across every delta batch)
    D.ngram_pairs_apply_delta(spark, b, d_small.limit(1)).collect()
    t_small = _t(lambda: D.ngram_pairs_apply_delta(spark, b, d_small))
    t_big = _t(lambda: D.ngram_pairs_apply_delta(spark, b, d_big))
    out["families"]["ngram_jaccard_pairs"] = {
        "full_rebuild_sec": round(t_rebuild, 3),
        "delta_2pct_sec": round(t_small, 3),
        "delta_8pct_sec": round(t_big, 3),
        "delta_rows": [d_small.count(), d_big.count()],
        "exponent_vs_delta": round(
            math.log(max(t_big, 1e-9) / max(t_small, 1e-9)) / math.log(4), 3
        ),
    }

    # ---- triangle credits: base = ~92% of orders ----
    li = load_table(spark, sf_dir, "lineitem")
    lb = os.path.join(work, "li_base")
    os.makedirs(lb)
    li.filter(F.col("l_orderkey") % 100 >= 8).write.parquet(
        os.path.join(lb, "lineitem.parquet")
    )
    l_small = li.filter(F.col("l_orderkey") % 100 < 2).localCheckpoint()
    l_big = li.filter(F.col("l_orderkey") % 100 < 8).localCheckpoint()
    t_rebuild = _t(lambda: G._triangle_credits(spark, sf_dir))
    G.triangle_credits_apply_delta(spark, lb, l_small.limit(1)).collect()
    t_small = _t(
        lambda: G.triangle_credits_apply_delta(spark, lb, l_small)
    )
    t_big = _t(lambda: G.triangle_credits_apply_delta(spark, lb, l_big))
    out["families"]["triangle_credits"] = {
        "full_rebuild_sec": round(t_rebuild, 3),
        "delta_2pct_sec": round(t_small, 3),
        "delta_8pct_sec": round(t_big, 3),
        "delta_rows": [l_small.count(), l_big.count()],
        "exponent_vs_delta": round(
            math.log(max(t_big, 1e-9) / max(t_small, 1e-9)) / math.log(4), 3
        ),
    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()

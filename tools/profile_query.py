"""Per-query job/stage-count + wall-time profiler (guide §1).

Job count is the stable local cost proxy this box allows (each AQE
job pays a ~0.1 s scheduling floor, and job counts do not drift with
ambient load the way wall-clock does) — the r14 round used exactly
this, ad hoc; this tool commits the method. Runs each named query in
THIS process's session: one untimed warm-up (noop sink), then a
timed noop-sink pass with the status tracker's job/stage ids diffed
across it.

Usage:
  python tools/profile_query.py QUERY [QUERY ...]
  python tools/profile_query.py --slowest N   # N slowest per BENCH_LOCAL
"""

from __future__ import annotations

import json
import os
import sys
import time

# import from the tree this script sits in (a historical worktree
# copy profiles ITS code, not /root/repo's)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbt_eamples_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def profile(spark, name: str, sf_dir: str) -> dict:
    q = entrymod.queries()[name]
    sc = spark.sparkContext
    sc.setJobDescription(f"profile-warmup: {name}")
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    st = sc.statusTracker()
    before = set(st.getJobIdsForGroup(None) or [])
    sc.setJobDescription(f"profile: {name}")
    t0 = time.perf_counter()
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    after = set(st.getJobIdsForGroup(None) or [])
    new_jobs = sorted(after - before)
    stages = 0
    for j in new_jobs:
        info = st.getJobInfo(j)
        if info is not None:
            stages += len(info.stageIds)
    sc.setJobDescription(None)
    return {
        "query": name,
        "jobs": len(new_jobs),
        "stages": stages,
        "warm_sec": round(dt, 4),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if names and names[0] == "--slowest":
        n = int(names[1])
        with open("/root/repo/BENCH_LOCAL.json") as fh:
            bl = json.load(fh)
        names = sorted(
            bl["queries"], key=lambda k: bl["queries"][k], reverse=True
        )[:n]
    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        r = profile(spark, name, sf_dir)
        print("PROFILE " + json.dumps(r), flush=True)


if __name__ == "__main__":
    main()

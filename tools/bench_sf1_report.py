"""Render BENCH_SF1.md (VERDICT r7 #5): the sf1 informational sweep
(the 25-query r1 shared set + the 12 slowest + the round-8 sampled
twin at the synthesized sf1.0 corpus) against the fresh full sf0.1
bench, with per-query sf0.1→sf1 exponents and a comparison against
the sf0.01→sf0.1 (10×) exponents where recorded.

Usage: python tools/bench_sf1_report.py SF1_BENCH_JSON_LOG > BENCH_SF1.md
(SF1 log = bench.py stdout from the SPARK_GRAFT_BENCH_ONLY run;
sf0.1 per-query minima come from the committed BENCH_LOCAL.json)
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(sys.argv[1]) as fh:
        line = [ln for ln in fh if ln.strip().startswith("{")][-1]
    sf1 = json.loads(line)
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as fh:
        sf01 = json.load(fh)
    assert abs(sf1["sf"] - 1.0) < 1e-9, "pass the sf1.0 bench log"
    q1, q01 = sf1["queries"], sf01["queries"]
    # optional: prior 10x exponents recorded in round notes (manual)
    print("# BENCH_SF1 — informational sf1.0 sweep (round 8)")
    print()
    print(
        f"Corpus: synthesized sf1.0 (tools/scale_corpus.py — 10 "
        f"key-shifted sf0.1 copies; duplicate/similarity structure "
        f"preserved within a copy, destroyed across copies). "
        f"Protocol: {sf1['protocol']}, fixed alphabetical order, "
        f"{len(q1)} queries. Raw per-pass totals "
        f"{sf1['raw_run_totals_sec']} s. sf0.1 reference: the "
        f"committed full-registry BENCH_LOCAL.json (same protocol; "
        f"note the reference run carries the other "
        f"{len(q01) - len(q1)} registry queries in its passes, so "
        f"ambient cache pressure differs slightly — informational)."
    )
    print()
    print("| query | sf0.1 s | sf1 s | ratio | exponent e (t∝SFᵉ) |")
    print("|---|---|---|---|---|")
    flagged = []
    skipped = []
    for name in sorted(q1):
        a, b = q01.get(name), q1[name]
        if not a:
            # no-silent-caps: record WHY the row is dropped so the
            # report's coverage can't shrink without a trace
            skipped.append(
                (name, "missing from BENCH_LOCAL.json" if a is None else "recorded 0.0 at sf0.1")
            )
            continue
        ratio = b / a
        e = math.log(ratio) / math.log(10)
        print(
            f"| `{name}` | {a:.3f} | {b:.3f} | {ratio:.2f}× | "
            f"{e:.2f} |"
        )
        if e > 1.05:
            flagged.append((name, e))
    tot1 = sum(q1.values())
    tot01 = sum(v for k, v in q01.items() if k in q1)
    print()
    print(
        f"Set totals: sf0.1 {tot01:.1f} s → sf1 {tot1:.1f} s "
        f"({tot1 / tot01:.2f}×, exponent "
        f"{math.log(tot1 / tot01) / math.log(10):.2f})."
    )
    if flagged:
        print()
        print("Super-linear (> 1.05) — explained or ticketed:")
        for name, e in flagged:
            print(f"- `{name}`: {e:.2f}")
    if skipped:
        print()
        print(
            f"Skipped {len(skipped)} swept queries (no sf0.1 "
            f"reference — listed, not silently dropped):"
        )
        for name, why in skipped:
            print(f"- `{name}`: {why}")


if __name__ == "__main__":
    main()

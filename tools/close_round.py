"""The end-of-round close protocol as ONE runnable sequence (round
10): every piece of evidence the judge reads, regenerated on the
final tree in the right order, with the stamps that preflight (and
the generated notes block) verify. Rounds 6–9 each lost a step to
hand-sequencing (stale sweeps, mid-round pytest counts, draft
exponents); this makes the protocol executable instead of
remembered.

Steps (all on the CURRENT tree — commit your source first):
  1. strict oracle sweep at sf0.01 and sf0.1 → .tmp logs
  2. tools/oracle_ledger.py → LOCAL_ORACLE_r{N}.md (tree-stamped)
  3. bench.py (3 passes) → BENCH_LOCAL.json (tree-stamped)
  3b. tools/bench_sf1_report.py → BENCH_SF1.md (tree-stamped,
      generated whole; synthesizes .tmp/sf1.0 first if absent)
  4. tools/bench_solo.py 10 → BENCH_SOLO.json (tree-stamped)
  5. tools/explain_audit.py → EXPLAINS.md
  6. full pytest → count
  7. tools/round_notes.py --prev REV --pytest-count N → Evidence
     block appended to ROUND{N}_NOTES.md (replacing any previous
     generated block), footer tree-stamped
  8. tools/preflight.py --fast (the full-suite gate was step 6)

Usage: python tools/close_round.py --round N --prev REV [--skip-pytest]
Exits non-zero the moment any step fails. Wall-clock ~1.5 h at
sf0.1 on local[32].
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

sys.path.insert(0, "/root/repo")

REPO = "/root/repo"
TMP = os.path.join(REPO, ".tmp")


def run(cmd: list[str], log: str | None = None) -> str:
    print(f"close: $ {' '.join(cmd)}" + (f" > {log}" if log else ""),
          flush=True)
    r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
    if log:
        with open(log, "w") as fh:
            fh.write(r.stdout)
            fh.write(r.stderr)
    if r.returncode != 0:
        tail = (r.stdout + r.stderr)[-2000:]
        raise SystemExit(f"close: step failed ({cmd[1] if len(cmd) > 1 else cmd[0]}):\n{tail}")
    return r.stdout


EVIDENCE_MARKER = "## Evidence (generated — tools/round_notes.py)"


def replace_evidence_block(
    notes_text: str | None, block: str, round_no: int
) -> str:
    """Idempotent notes assembly: the hand-written prose (everything
    before the generated marker) is preserved verbatim; any previous
    generated block is replaced by the fresh one, so re-running the
    close never duplicates or strands Evidence sections."""
    if notes_text is None:
        head = f"# Round {round_no} notes\n\n"
    else:
        head = notes_text.split(EVIDENCE_MARKER)[0].rstrip() + "\n\n"
    return head + block


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--prev", required=True,
                    help="previous round's close commit rev")
    ap.add_argument("--skip-pytest", action="store_true",
                    help="reuse a pytest count already measured on "
                    "THIS tree (pass it via --pytest-count)")
    ap.add_argument("--pytest-count", type=int, default=None)
    args = ap.parse_args()
    os.makedirs(TMP, exist_ok=True)
    py = sys.executable

    # 1. strict sweeps
    log001 = os.path.join(TMP, "sweep_sf001.log")
    log01 = os.path.join(TMP, "sweep_sf01.log")
    run([py, "tools/oracle_check.py", "/root/testdata/sf0.01"], log001)
    run([py, "tools/oracle_check.py", "/root/testdata/sf0.1"], log01)
    for log in (log001, log01):
        txt = open(log, errors="replace").read()
        m = re.search(r"(\d+) failures", txt)
        if not m or m.group(1) != "0":
            raise SystemExit(f"close: sweep {log} has failures — stop")

    # 2. ledger
    ledger = run([py, "tools/oracle_ledger.py", log001, log01])
    with open(os.path.join(REPO, f"LOCAL_ORACLE_r{args.round}.md"), "w") as fh:
        fh.write(ledger)

    # 3. bench (writes BENCH_LOCAL.json itself)
    run([py, "bench.py"], os.path.join(TMP, "bench_close.log"))

    # 3b. BENCH_SF1.md regeneration (VERDICT r10 #6): generated
    # whole on this tree, against the fresh BENCH_LOCAL.json — its
    # engine-tree footer is preflight-gated, so a close on a tree
    # without the synthesized corpus must build it first
    if not os.path.isdir(os.path.join(TMP, "sf1.0")):
        run([py, "tools/scale_corpus.py"],
            os.path.join(TMP, "scale_corpus_close.log"))
    run([py, "tools/bench_sf1_report.py"],
        os.path.join(TMP, "bench_sf1_close.log"))

    # 4. solo ledger (writes BENCH_SOLO.json itself). The previous
    # close's BENCH_LOCAL.json is extracted from git so any shared
    # query that regressed ≥1.25× in-run is AUTO re-timed solo and
    # adjudicated in the ledger's `movers` section (VERDICT r11 #5 —
    # no more by-judgment noise calls)
    solo_cmd = [py, "tools/bench_solo.py", "10"]
    prev_bl = subprocess.run(
        ["git", "show", f"{args.prev}:BENCH_LOCAL.json"],
        cwd=REPO, capture_output=True, text=True,
    )
    if prev_bl.returncode == 0 and prev_bl.stdout.strip():
        prev_path = os.path.join(TMP, "prev_bench_local.json")
        with open(prev_path, "w") as fh:
            fh.write(prev_bl.stdout)
        solo_cmd += ["--prev-bench", prev_path]
    else:
        print("close: WARN no BENCH_LOCAL.json at --prev rev — solo "
              "ledger runs without mover arbitration", flush=True)
    # the previous close's SOLO ledger too (round 13): a mover with a
    # prior solo figure is adjudicated solo-vs-solo — apples-to-apples
    # across spawns — instead of solo-vs-in-run
    prev_solo = subprocess.run(
        ["git", "show", f"{args.prev}:BENCH_SOLO.json"],
        cwd=REPO, capture_output=True, text=True,
    )
    if prev_solo.returncode == 0 and prev_solo.stdout.strip():
        prev_solo_path = os.path.join(TMP, "prev_bench_solo.json")
        with open(prev_solo_path, "w") as fh:
            fh.write(prev_solo.stdout)
        solo_cmd += ["--prev-solo", prev_solo_path]
    run(solo_cmd, os.path.join(TMP, "solo_close.log"))

    # 4b. committed round-over-round delta (VERDICT r14 #7): the
    # driver's PERF comparison keeps dying to one-line tail
    # truncation, so the close itself now commits the per-query
    # prev/now table, ambient-corrected, with the solo-adjudicated
    # movers folded in. Reader-only: touches no timed protocol.
    if prev_bl.returncode == 0 and prev_bl.stdout.strip():
        run([py, "tools/bench_delta.py", "--prev", args.prev],
            os.path.join(TMP, "bench_delta_close.log"))
    else:
        print("close: WARN no prev BENCH_LOCAL — skipping BENCH_DELTA",
              flush=True)

    # 5. plan audit
    run([py, "tools/explain_audit.py"],
        os.path.join(TMP, "explains_close.log"))

    # 6. full suite
    count = args.pytest_count
    if not args.skip_pytest:
        # --runslow: the close runs the FULL suite including the
        # slow-lane equivalence suites the default run skips so the
        # driver's `pytest tests/ -x -q` completes in budget
        # (VERDICT r14 #2)
        out = run([py, "-m", "pytest", "tests/", "-q", "--runslow"],
                  os.path.join(TMP, "pytest_close.log"))
        m = re.search(r"(\d+) passed", open(
            os.path.join(TMP, "pytest_close.log")).read())
        if not m:
            raise SystemExit("close: could not parse pytest count")
        count = int(m.group(1))
    if count is None:
        raise SystemExit("close: --skip-pytest requires --pytest-count")

    # 7. notes evidence (replace any previous generated block)
    block = run([py, "tools/round_notes.py", "--prev", args.prev,
                 "--pytest-count", str(count)])
    notes_path = os.path.join(REPO, f"ROUND{args.round}_NOTES.md")
    prior = open(notes_path).read() if os.path.exists(notes_path) else None
    with open(notes_path, "w") as fh:
        fh.write(replace_evidence_block(prior, block, args.round))

    # 8. coherence gate (suite already ran as step 6).
    # --fresh-evidence: the BENCH_LOCAL.json this close just wrote is
    # expected-dirty (it is the thing to commit next) — without the
    # flag every close ended on a false red here (r10–r12)
    run([py, "tools/preflight.py", "--fast", "--fresh-evidence"])
    print("close: ALL STEPS GREEN — commit the evidence files now")


if __name__ == "__main__":
    main()

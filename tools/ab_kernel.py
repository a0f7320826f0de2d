"""Interleaved fresh-JVM kernel A/B (VERDICT r14 #1 adjudication).

The r14 round left five rewrites (CC-kernel dedup family + coreset)
wall-clock UNCONFIRMED: both benches read them 0.70-0.80x vs a
~0.89x untouched median, but no committed solo evidence existed.
This tool settles such questions the only way ambient drift allows:
for one query it alternates fresh-JVM solo children (bench_solo's
--one protocol: warm-up + best-of-3, noop sink) between two values
of a kernel-selection env var, A,B,A,B,... so both variants sample
the same minutes of machine state, and reports the per-variant MIN
across spawns (the bench.py min-of-3 philosophy applied across
JVMs).

Usage:
  python tools/ab_kernel.py QUERY ENVVAR VALUE_A VALUE_B [--reps N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def solo_child(name: str, sf_dir: str, env_extra: dict) -> float:
    env = dict(os.environ)
    env.update(env_extra)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_solo.py"),
         "--one", name, sf_dir],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    line = next(
        (ln for ln in r.stdout.splitlines()
         if ln.startswith("SOLO_RESULT ")),
        None,
    )
    if line is None:
        print(f"ab_kernel: {name} {env_extra} FAILED:\n{r.stderr[-3000:]}",
              file=sys.stderr)
        sys.exit(1)
    return json.loads(line[len("SOLO_RESULT "):])[name]


def main() -> None:
    argv = list(sys.argv[1:])
    reps = 3
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i:i + 2]
    query, envvar, va, vb = argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    times: dict[str, list[float]] = {va: [], vb: []}
    for rep in range(reps):
        for val in (va, vb):
            t = solo_child(query, sf_dir, {envvar: val})
            times[val].append(t)
            print(f"rep {rep} {envvar}={val}: {t} s", flush=True)
    out = {
        "query": query,
        "envvar": envvar,
        "sf_dir": sf_dir,
        "reps": reps,
        "times": times,
        "min": {v: min(ts) for v, ts in times.items()},
    }
    print("AB_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()

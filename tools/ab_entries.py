"""Interleaved fresh-JVM A/B of contract entries between two checkouts.

The only timing signal that survives this multi-tenant box is an
interleaved same-window comparison of minima (PERF §10): run variant A,
then variant B, alternating, each in a fresh JVM, and compare the
per-variant MINIMUM. This script automates that for named `queries()`
entries across two repo checkouts (e.g. HEAD vs a previous round's
commit in a git worktree).

Usage:
  python tools/ab_entries.py <repoA> <repoB> entry1 [entry2 ...]
Env: AB_REPS (default 4), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (8)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPS = int(os.environ.get("AB_REPS", "4"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")

_CHILD = r"""
import json, os, sys, time
repo = sys.argv[1]; names = sys.argv[2:]
sys.path.insert(0, repo)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS','8')}]")
    .config("spark.sql.shuffle.partitions", os.environ.get('SPARK_GRAFT_CPUS','8'))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
import __spark_entry__ as em
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs = em.queries()
out = {}
for nm in names:
    qs[nm](spark, sf).count()  # warm (cache materialization, codegen)
    t0 = time.monotonic(); qs[nm](spark, sf).count()
    out[nm] = round(time.monotonic() - t0, 3)
print("ABRESULT " + json.dumps(out))
spark.stop()
"""


def run_child(repo: str, names: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, *names],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=repo,
        env=os.environ.copy(),
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    sys.stderr.write(proc.stderr[-2000:])
    raise RuntimeError(f"child in {repo} produced no result")


def main() -> None:
    repo_a, repo_b, *names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: ab_entries.py <repoA> <repoB> entry...")
    runs: dict[str, dict[str, list[float]]] = {
        r: {n: [] for n in names} for r in ("A", "B")
    }
    for rep in range(REPS):  # interleaved: A, B, A, B, ...
        for tag, repo in (("A", repo_a), ("B", repo_b)):
            got = run_child(repo, names)
            for n in names:
                runs[tag][n].append(got[n])
            print(f"rep {rep} {tag}: {got}", file=sys.stderr)
    summary = {
        n: {
            "A_min": min(runs["A"][n]),
            "B_min": min(runs["B"][n]),
            "A_runs": runs["A"][n],
            "B_runs": runs["B"][n],
        }
        for n in names
    }
    print(json.dumps({"repoA": repo_a, "repoB": repo_b, "sf_dir": SF_DIR,
                      "entries": summary}))


if __name__ == "__main__":
    main()

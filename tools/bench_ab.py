"""Mechanical bench-weather attribution (r11, VERDICT r10 task 3).

Two consecutive driver benches landed on loaded boxes (+38% headline
in r10 with untouched entries drifting +13..73%), and the weather
adjudication leaned on the builder's in-round preview being same-code
— honest, but it required judge archaeology.  This tool makes the
attribution mechanical: it checks out the PREVIOUS round's recorded
commit in a git worktree and runs the headline entries as interleaved
fresh-JVM arms on the same box in one session — A, B, A, B, min-of-N
per arm (the PERF §10 discipline; the only timing signal that
survives this multi-tenant box).  The per-entry ratio table then
separates code from weather directly:

* a loaded window hits BOTH arms alike, so weather shows up as both
  minima inflated with ratio ~1;
* a real regression shows up as the ratio diverging from 1 on exactly
  the touched entries, regardless of the window's absolute level.

Usage:
  python tools/bench_ab.py [--base <ref>] [--keep-worktree] [entry ...]

Defaults: base = the newest ``round N:`` driver commit (the previous
round's recorded code); entries = bench.py's HEADLINE list, filtered
to names both arms implement.  Env: AB_REPS (default 4),
SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (8).

Prints one JSON line: {"base": sha, "entries": {name: {"A_min": ...,
"B_min": ..., "ratio": B/A, "A_runs": [...], "B_runs": [...]}},
"flagged": [names with |ratio-1| > 0.10]}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPS = int(os.environ.get("AB_REPS", "4"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_entries import run_child  # noqa: E402  (the interleave core)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def _default_base() -> str:
    """The newest driver round-commit — the previous round's recorded
    code (the driver commits ``round N: verdict/advice/...`` at each
    round boundary, so this is exactly what BENCH_r{N}.json ran)."""
    sha = _git(
        "log", "--grep", "^round [0-9]*:", "-n", "1", "--format=%H"
    )
    if not sha:
        raise SystemExit(
            "bench_ab: no 'round N:' commit found; pass --base <ref>"
        )
    return sha


def _arm_entries(repo: str, wanted: list[str]) -> set[str]:
    """queries() names an arm actually implements (the base arm may
    predate entries added since)."""
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys, json; sys.path.insert(0, sys.argv[1]); "
            "import __spark_entry__ as em; "
            "print('NAMES ' + json.dumps(sorted(em.queries())))",
            repo,
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=repo,
    )
    for line in out.stdout.splitlines():
        if line.startswith("NAMES "):
            return set(json.loads(line[len("NAMES "):])) & set(wanted)
    raise RuntimeError(f"could not list queries() in {repo}")


def main() -> None:
    args = sys.argv[1:]
    base = None
    keep = False
    entries: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--base":
            base = next(it)
        elif a == "--keep-worktree":
            keep = True
        else:
            entries.append(a)
    base_sha = _git("rev-parse", base or _default_base())
    if not entries:
        from bench import HEADLINE  # repo root on sys.path

        entries = list(HEADLINE)

    wt = os.path.join(
        tempfile.gettempdir(), f"bench_ab_{base_sha[:12]}"
    )
    fresh = not os.path.isdir(wt)
    if fresh:
        _git("worktree", "add", "--detach", wt, base_sha)
    try:
        names = sorted(
            _arm_entries(wt, entries) & _arm_entries(REPO, entries)
        )
        dropped = sorted(set(entries) - set(names))
        if dropped:
            print(f"bench_ab: not in both arms, dropped: {dropped}",
                  file=sys.stderr)
        runs: dict[str, dict[str, list[float]]] = {
            t: {n: [] for n in names} for t in ("A", "B")
        }
        for rep in range(REPS):  # interleaved: A, B, A, B, ...
            for tag, repo in (("A", wt), ("B", REPO)):
                got = run_child(repo, names)
                for n in names:
                    runs[tag][n].append(got[n])
                print(f"rep {rep} {tag}: {got}", file=sys.stderr)
        summary, flagged = {}, []
        for n in names:
            a, b = min(runs["A"][n]), min(runs["B"][n])
            ratio = round(b / a, 3) if a > 0 else None
            summary[n] = {
                "A_min": a,
                "B_min": b,
                "ratio": ratio,
                "A_runs": runs["A"][n],
                "B_runs": runs["B"][n],
            }
            if ratio is not None and abs(ratio - 1.0) > 0.10:
                flagged.append(n)
        print(
            json.dumps(
                {
                    "base": base_sha,
                    "head": _git("rev-parse", "HEAD"),
                    "sf_dir": os.environ.get(
                        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
                    ),
                    "reps": REPS,
                    "entries": summary,
                    "flagged": flagged,
                }
            )
        )
    finally:
        if fresh and not keep:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO,
                capture_output=True,
            )


if __name__ == "__main__":
    main()

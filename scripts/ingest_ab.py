#!/usr/bin/env python
"""Same-box ingest A/B (r7 verdict ask #3): run ``bench.bench_ingest``
at HEAD and at the r5 snapshot commit (the 871k msg/s best), back to
back in the same session on an idle box, and write the paired arrays
to ``scripts/ingest_ab_r09.json`` (bench.py folds the newest
``ingest_ab_r*.json`` into the round's BENCH record). If HEAD is
within noise of the r5 code on the same box, the three-round ingest
"decline" (871k -> 690k -> 644k) was box drift, not a code
regression — closing the r6 ask with data.

Usage: python scripts/ingest_ab.py <r5_checkout_dir> [n_msgs]
"""

from __future__ import annotations

import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every module on the measured ingest path, repo-relative. Recorded
# INSIDE the artifact at measurement time so bench.py's freshness
# check (git diff over these paths vs the artifact's head_commit)
# can never run against a stale hardcoded list (r10 ADVICE).
MEASURED_PATHS = [
    "dump1090_db_stream_spark/functions/parser.py",
    "dump1090_db_stream_spark/schema.py",
    "dump1090_db_stream_spark/session.py",
    "tests/fixtures.py",
    "scripts/ingest_ab.py",
    "bench.py",
]


def run_at(checkout: str, spark, n_msgs: int) -> dict:
    """Import that checkout's bench + parser modules fresh and run its
    own bench_ingest (the measured code is the checkout's, the
    SparkSession is shared so JVM state is identical)."""
    saved = dict(sys.modules)
    for m in list(sys.modules):
        if m.startswith(("dump1090_db_stream_spark", "bench", "tests")):
            del sys.modules[m]
    sys.path.insert(0, checkout)
    try:
        bench = importlib.import_module("bench")
        assert bench.__file__.startswith(checkout), bench.__file__
        return bench.bench_ingest(spark, n_msgs=n_msgs)
    finally:
        sys.path.remove(checkout)
        sys.modules.clear()
        sys.modules.update(saved)


def main() -> None:
    # abspath: run_at asserts the imported module's __file__ (always
    # absolute) startswith the checkout dir — a relative argv[1] would
    # fail that spuriously (r8 ADVICE).
    r5_dir = os.path.abspath(sys.argv[1])
    n_msgs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    sys.path.insert(0, REPO)
    from dump1090_db_stream_spark import get_spark

    spark = get_spark("ingest-ab")
    import subprocess

    head = subprocess.check_output(
        ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
        text=True).strip()
    r5 = subprocess.check_output(
        ["git", "-C", r5_dir, "rev-parse", "--short", "HEAD"],
        text=True).strip()
    # interleave half-size passes twice so slow box phases hit both
    # sides, then keep each side's min-of-6 overall
    results = {"head": [], "r5": []}
    for _ in range(2):
        results["head"].append(run_at(REPO, spark, n_msgs))
        results["r5"].append(run_at(r5_dir, spark, n_msgs))
    out = {
        "n_msgs": n_msgs,
        "head_commit": head,
        "r5_commit": r5,
        "measured_paths": MEASURED_PATHS,
        "head_runs_sec": [s for r in results["head"]
                          for s in r["runs_sec"]],
        "r5_runs_sec": [s for r in results["r5"]
                        for s in r["runs_sec"]],
    }
    out["head_best_msgs_per_sec"] = round(
        n_msgs / min(out["head_runs_sec"]))
    out["r5_best_msgs_per_sec"] = round(n_msgs / min(out["r5_runs_sec"]))
    out["head_over_r5"] = round(
        out["head_best_msgs_per_sec"] / out["r5_best_msgs_per_sec"], 3)
    path = os.path.join(REPO, "scripts", "ingest_ab_r09.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

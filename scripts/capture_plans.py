#!/usr/bin/env python
"""Capture .explain("formatted") physical plans for named registry queries.

Usage: python scripts/capture_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each named query, built at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].  Used for the plans/r14/*_{before,after}.txt
optimization-round evidence files (guide §1.3).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dump1090_db_stream_spark import get_spark, release_tracked  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]")
    os.makedirs(out_dir, exist_ok=True)
    reg = entrymod.queries()
    for name in names:
        df = reg[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
            if not plan.endswith("\n"):
                fh.write("\n")
        print(f"wrote {path} ({len(plan)} chars)")
        release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()

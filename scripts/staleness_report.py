#!/usr/bin/env python3
"""Driver-verification staleness report (r13 verdict ask #6).

For every query in the registry, computes the latest round whose driver
CORRECTNESS_r{N}.json holds a fully-green row (rows/schema/hash all true,
err null) for that query.  The driver only verifies the FIRST 50 entries
of ``queries()`` per round, so at 200+ contracts the stalest tier ages
~4 rounds between hard signals; this report is the committed, auditable
record of that ageing (COVERAGE.md "Driver window" policy) and the input
to each round's rotation tiers.

Usage:  python scripts/staleness_report.py [--json out.json]
Prints a per-round histogram and the full stalest-first listing; with
--json also writes {query: latest_green_round} plus the histogram.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_registry_order() -> list[str]:
    sys.path.insert(0, REPO)
    import importlib

    entry = importlib.import_module("__spark_entry__")
    return list(entry.queries().keys())


def latest_green_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            green = (
                rec.get("rows_match") is True
                and rec.get("schema_match") is True
                # rows-only entries (no oracle) report hash_match null;
                # they still count as a driver hard signal
                and rec.get("hash_match") in (True, None)
                and rec.get("err") is None
            )
            if green and rnd > latest.get(name, -1):
                latest[name] = rnd
    return latest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="also write a JSON record")
    args = ap.parse_args()

    order = load_registry_order()
    latest = latest_green_rounds()

    rows = [(latest.get(q, 0), i, q) for i, q in enumerate(order)]
    rows.sort()

    hist: dict[int, int] = {}
    for rnd, _, _ in rows:
        hist[rnd] = hist.get(rnd, 0) + 1

    print(f"registry: {len(order)} queries; driver window: first 50")
    print("latest-driver-green histogram (0 = never driver-verified):")
    for rnd in sorted(hist):
        label = f"r{rnd}" if rnd else "never"
        print(f"  {label:>6}: {hist[rnd]:3d}")
    print("\nstalest-first listing (latest_green, registry_pos, query):")
    for rnd, pos, q in rows:
        label = f"r{rnd}" if rnd else "never"
        print(f"  {label:>6}  @{pos:3d}  {q}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {
                    "registry_size": len(order),
                    "histogram": {str(k): v for k, v in sorted(hist.items())},
                    "latest_green": {q: latest.get(q, 0) for q in order},
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"\nwrote {args.json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

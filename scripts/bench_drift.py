#!/usr/bin/env python
"""Round-over-round extended-set drift comparator (judge r10 ask #4):
a single ``extended_total`` scalar hides regressions in the 85-entry
tail, so this flags per-entry movers between two bench DETAIL records
(the ``BENCH_DETAIL_LAST.json`` shape; snapshot each round as
``scripts/bench_detail_r{N}.json`` — end-of-round checklist #3).

Each ratio is DRIFT-ADJUSTED by the calibration probe (the frozen
lineitem scan both runs carry): adj_ratio = (cur/cal_cur) /
(prev/cal_prev), so a uniformly slower box does not flag everything.
Entries present on only one side are listed separately (registry
grew/shrank — expected, not drift).

Usage: python scripts/bench_drift.py <prev_detail.json>
       <cur_detail.json> [threshold=1.5]
Exit code 0 always (a reporter, not a gate — movers need a human
verdict in SCALE.md: noise band vs real regression).
"""

from __future__ import annotations

import json
import sys


def compare(prev: dict, cur: dict, threshold: float = 1.5) -> dict:
    cal_p = float(prev["calibration"]["sec"])
    cal_c = float(cur["calibration"]["sec"])
    ep, ec = prev["extended"], cur["extended"]
    shared = sorted(set(ep) & set(ec))
    movers = {}
    for q in shared:
        if ep[q] <= 0:
            continue
        adj = (ec[q] / cal_c) / (ep[q] / cal_p)
        if adj >= threshold or adj <= 1.0 / threshold:
            movers[q] = {"prev_sec": ep[q], "cur_sec": ec[q],
                         "adj_ratio": round(adj, 3)}
    return {
        "calibration_prev": cal_p,
        "calibration_cal_drift": round(cal_c / cal_p, 3),
        "n_shared": len(shared),
        "threshold": threshold,
        "movers": dict(sorted(movers.items(),
                              key=lambda kv: -kv[1]["adj_ratio"])),
        "only_prev": sorted(set(ep) - set(ec)),
        "only_cur": sorted(set(ec) - set(ep)),
        "extended_total_prev": prev.get("extended_total"),
        "extended_total_cur": cur.get("extended_total"),
        "extended_total_adj_ratio": round(
            (cur.get("extended_total", 0) / cal_c)
            / (prev.get("extended_total", 1) / cal_p), 3),
    }


def main() -> None:
    with open(sys.argv[1]) as fh:
        prev = json.load(fh)
    with open(sys.argv[2]) as fh:
        cur = json.load(fh)
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    print(json.dumps(compare(prev, cur, threshold), indent=2))


if __name__ == "__main__":
    main()

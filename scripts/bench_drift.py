#!/usr/bin/env python
"""Round-over-round extended-set drift comparator (judge r10 ask #4):
a single ``extended_total`` scalar hides regressions in the 85-entry
tail, so this flags per-entry movers between two bench DETAIL records
(the ``BENCH_DETAIL_LAST.json`` shape; snapshot each round as
``scripts/bench_detail_r{N}.json`` — end-of-round checklist #3).

Each ratio is DRIFT-ADJUSTED by the frozen probe matching the entry's
SHAPE (r12 verdict ask #1 — the scan probe alone false-flagged 53
sub-second entries when scheduler latency drifted while scan
throughput did not):

- entries under SCHED_SHAPE_SEC on the PREV side are job-overhead-
  dominated -> adjusted by the scheduler probe (32 one-task jobs);
- everything else is scan/CPU-dominated -> adjusted by the scan-agg
  probe (the r8 frozen lineitem aggregate).

adj_ratio = (cur/probe_cur) / (prev/probe_prev). When either record
predates the scheduler probe (< r13) every entry falls back to the
scan probe and the output says so (``scheduler_probe_available``).
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

#: below this prev-side runtime an entry's cost is dominated by
#: per-job scheduling overhead, not data movement (measured r12: the
#: uniform-shift signature hit 1.15-1.9x exactly on the sub-second
#: tier while multi-second scan-bound entries moved with the scan
#: probe or got faster)
SCHED_SHAPE_SEC = 1.0


def compare(prev: dict, cur: dict, threshold: float = 1.5) -> dict:
    cal_p = float(prev["calibration"]["sec"])
    cal_c = float(cur["calibration"]["sec"])
    sch_p = float(prev.get("scheduler_calibration", {}).get("sec") or 0)
    sch_c = float(cur.get("scheduler_calibration", {}).get("sec") or 0)
    have_sched = sch_p > 0 and sch_c > 0
    ep, ec = prev["extended"], cur["extended"]
    shared = sorted(set(ep) & set(ec))
    movers = {}
    n_sched_axis = 0
    for q in shared:
        if ep[q] <= 0:
            continue
        sched_shape = have_sched and ep[q] < SCHED_SHAPE_SEC
        if sched_shape:
            n_sched_axis += 1
            adj = (ec[q] / sch_c) / (ep[q] / sch_p)
        else:
            adj = (ec[q] / cal_c) / (ep[q] / cal_p)
        if adj >= threshold or adj <= 1.0 / threshold:
            movers[q] = {"prev_sec": ep[q], "cur_sec": ec[q],
                         "adj_ratio": round(adj, 3),
                         "axis": ("scheduler" if sched_shape
                                  else "scan")}
    return {
        "calibration_prev": cal_p,
        "calibration_cal_drift": round(cal_c / cal_p, 3),
        "scheduler_probe_available": have_sched,
        "scheduler_prev": sch_p or None,
        "scheduler_drift": (round(sch_c / sch_p, 3)
                            if have_sched else None),
        "n_shared": len(shared),
        "n_scheduler_axis": n_sched_axis,
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

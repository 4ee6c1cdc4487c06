#!/usr/bin/env python
"""Scaling audit: run representative contract queries at sf0.001 /
sf0.01 / sf0.1 and report the runtime growth per 10x data step.

A quadratic operator (lost join key, all-pairs comparison, unbounded
state) shows up as a step ratio approaching 100x; healthy operators
stay well under 10x at these sizes because fixed overheads (plan
compile, job scheduling) dominate small inputs. SCALE.md records the
latest table.

Usage: python scripts/scaling_check.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from dump1090_db_stream_spark import get_spark  # noqa: E402
from dump1090_db_stream_spark.cache import release_tracked  # noqa: E402

DEFAULT = [
    "flights_band_join",      # broadcast band join
    "ngram_jaccard_dups",     # inverted-index self-join
    "minhash_lsh_dups",       # LSH + verify
    "embedding_neardup_pairs",  # hyperplane bucketing
    "fuzzy_name_matches",     # q-gram prefix filter join
    "sliding_window_counts",  # window explode + agg
    "tfidf_top_terms",        # token pipeline + two aggs
    "event_trailing_stats",   # range-frame window
    "gap_fill_locf",          # bucket agg -> grid explode -> windows
    "weekly_active_users",    # dedup -> vote explode -> count_distinct
    "value_runs_scd2",        # shared-exchange window chain
    "token_budget_sample",    # hash-order running-sum prefix cut
    "capped_user_events",     # map-side WindowGroupLimit cap
    "line_dedup_docs",        # line df + broadcast removal + rebuild
    "concurrent_sessions",    # interval bucket-cover overlap self-join
    "entity_resolution",      # fuzzy pair graph + connected components
    "quartile_stratified_sample",  # score -> cutoffs -> ranked caps
    "dau_wau_stickiness",     # shared dedup barrier + two vote tiers
    "duplicate_text_spans",   # positional shingle df + island merge
    "stripped_duplicate_spans",  # cover explode + doc reconstruction
    "data_expectations",      # one-pass multi-rule gate
    # round-6 additions. semantic_dedup / pagerank_neardups are NOT
    # here: their contract queries fix k=8 clusters / use the exact
    # all-pairs validator as the edge source, so both are documented
    # quadratic at contract params (the scale paths — n_clusters
    # scaled with corpus, LSH pairs feeding pagerank() — are the
    # bucketed shapes audited above).
    "winnow_fingerprints",    # window-cover explode + min-struct agg
    "doc_bigram_logprob",     # bigram relation + vocab joins
    "excess_share_suppliers",  # two aggs + semi-join (TPC-H Q20 shape)
    "gopher_quality",         # narrow rule projection
    "length_batches",         # one window + one aggregate
]

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    qs = entrymod.queries()
    spark = get_spark("scaling-check")
    print(f"{'query':26s} " + " ".join(f"{sf:>9s}" for sf in SFS)
          + "   ratio01 ratio10")
    worst = 0.0
    for name in names:
        fn = qs[name]
        times = []
        for sf in SFS:
            best = 1e9
            for _ in range(2):
                release_tracked()
                t0 = time.time()
                fn(spark, f"/root/testdata/{sf}").write.format(
                    "noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times.append(best)
        r01 = times[1] / times[0]
        r10 = times[2] / times[1]
        worst = max(worst, r10)
        print(f"{name:26s} " + " ".join(f"{t:9.3f}" for t in times)
              + f"   {r01:7.2f} {r10:7.2f}")
    print(f"\nworst 10x-data step ratio: {worst:.2f} "
          f"({'OK — far below the 100x quadratic signature' if worst < 20 else 'INVESTIGATE'})")
    return 0 if worst < 20 else 1


if __name__ == "__main__":
    raise SystemExit(main())

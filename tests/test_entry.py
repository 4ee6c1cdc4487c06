"""Driver-contract smoke tests: entry() + every queries() entry runs at
sf0.001 and each declared oracle key matches a queries key."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["user_id", "ts", "value", "event_type"]


def test_every_query_runs(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert os_ <= qs


def test_rows_only_exceptions_are_exactly_the_documented_two():
    """Every registered query must ship an oracle EXCEPT the two
    rows-only-by-design sketch queries (HLL internals are engine-
    specific; each has a fully-oracled portable counterpart). A new
    query landing without an oracle_sql entry silently downgrades its
    driver check to rows-only — this gate makes that a test failure
    instead of a judge finding."""
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert qs - os_ == {"event_approx_stats", "daily_distinct_rollup"}


def test_r10_window_composition():
    """Pins the round-10 driver-window invariants (COVERAGE.md "Driver
    correctness window"): the two NEW queries lead (tier 1 —
    ann_recall_lsh / ann_recall_ivfpq, completing recall contracts
    across the ANN ladder), then tier 2 — ann_recall_ivf (re-verifies
    after its BNLJ was adjudicated into the cross-product gate
    allowlist, the r9 red test) and the three prefix-sum-family
    queries re-pinned after the r10 NaN filter + grouped-vocabulary
    guard — then the recorded r10 rotation: the rest of the r6-window
    tail (36 queries, like_prefix_filter .. bm25_scores) and the head
    of the r7 window (pricing_summary .. corpus_diff) fill to exactly
    50. Rows-only sketch queries stay ADJACENT to their fully-oracled
    twins; positions 51+ lead with the rest of the r7 window (the r11
    rotation queue), then the r8 greens, then the r9 greens (freshest)
    close the registry."""
    order = list(entrymod.queries())
    window = order[:50]
    assert window[:2] == [                            # tier 1: new
        "ann_recall_lsh", "ann_recall_ivfpq"]
    assert window[2:6] == [                           # tier 2: changed
        "ann_recall_ivf", "dsir_auc_by_source", "dsir_auc",
        "score_normalized"]
    # tier 3 fill: the r6-window tail in recorded staleness order
    assert window[6] == "like_prefix_filter"
    assert window[7] == "equality_filter"
    assert window[41] == "bm25_scores"
    # ... then the r7-window head completes the 50
    assert window[42] == "pricing_summary"
    assert window[-1] == "corpus_diff"
    # positions 51+: late r10 additions are r11-queued (the r5
    # late-arrival rule), then the rest of the r7 window leads the
    # r11 rotation
    assert order[50:56] == ["unimax_allocation", "quality_funnel",
                            "ann_recall_int8", "ann_recall_pq",
                            "vocab_coverage", "source_divergence"]
    assert order[56] == "late_shipment_priority"
    # the r8 then r9 greens (freshest, untouched) close the registry
    assert order.index("multimodal_features") > \
        order.index("idle_rich_customers")
    assert order.index("retrieval_metrics") > \
        order.index("disjunctive_revenue")
    assert order[-1] == "window_track_lines"
    # rows-only sketch queries adjacent to their oracled twins
    assert order.index("weekly_active_estimate") == \
        order.index("event_approx_stats") + 1
    assert order.index("table_profile_approx") == \
        order.index("daily_distinct_rollup") + 1

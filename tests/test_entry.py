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


def test_every_query_ships_an_oracle():
    """Every registered query must ship an oracle — since r11 with NO
    exceptions: the two formerly rows-only HLL sketch queries now emit
    band-gated contracts (exact columns + within-band booleans the
    oracle pins to literal TRUE). A new query landing without an
    oracle_sql entry silently downgrades its driver check to
    rows-only — this gate makes that a test failure instead of a
    judge finding."""
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert qs - os_ == set()


def test_hll_estimates_land_inside_documented_bands(spark, sf_dir):
    """The band gates themselves (r10 verdict ask #3): a sketch
    estimate outside its documented error band makes these booleans
    FALSE, which both fails here and hash-mismatches at the driver
    (the oracle emits literal TRUE)."""
    for name, cols in [
            ("event_approx_stats",
             ["distinct_within_band", "median_within_band"]),
            ("daily_distinct_rollup", ["estimate_within_band"])]:
        rows = entrymod.queries()[name](spark, sf_dir).collect()
        assert rows, name
        for r in rows:
            for c in cols:
                assert r[c] is True, (name, c, r)


def test_r13_window_composition():
    """Pins the round-13 driver-window invariants (COVERAGE.md "Driver
    correctness window"): tier 2 — the capstone JSONL-export manifest
    and the driver-local production-K BPE trainer; tier 3 — every
    query whose implementation OR oracle changed since its last driver
    green (K=12 BPE contracts on the incremental trainer, the K=64
    pair for the bpe.py slice clamps, the four snapshot-drift oracles'
    NULL-ts symmetry, all seven graph.py consumers for the
    per-iteration checkpoint release, the refactored capstone); the
    streaming-cadence slot (aircraft_json_parse, r10 — batch-replay
    oracles of streaming paths never exceed 2 rounds' staleness);
    tier 1 — ALL 22 queries whose last driver row is r8 (the r12
    verdict's ask #2), then the head of the r9 greens fills to exactly
    50. Positions 51+: the remaining r9 greens (the r14 rotation
    queue), then the r10 greens, then the r11 greens, then the
    r12-window greens (freshest) close the registry."""
    order = list(entrymod.queries())
    window = order[:50]
    assert window[:4] == ["jsd_snapshot_drift", "ph_value_drift",
                          "capstone_export", "bpe_merges_k64_local"]
    assert window[4:21] == [        # tier 3: changed since last green
        "pipeline_capstone", "bpe_merges", "bpe_vocab",
        "bpe_encoded_stats", "bpe_merges_k64", "bpe_vocab_k64",
        "ranksum_snapshot_drift", "chisq_snapshot_drift",
        "ks_snapshot_drift", "w1_snapshot_drift",
        "neardup_clusters", "neardup_clusters_star",
        "neardup_survivors", "quality_survivors",
        "entity_resolution", "pagerank_neardups", "pagerank_docs"]
    assert window[21] == "aircraft_json_parse"  # streaming cadence
    assert window[22:44] == [       # tier 1: the full r8-stale set
        "set_ops_segments", "cosine_neardup_pairs", "doc_quality",
        "lang_id_counts", "doc_fingerprints", "exact_dup_docs",
        "embedding_topk", "revenue_by_nation", "doc_token_stats",
        "sbs1_parse", "top_revenue_orders", "session_windows",
        "event_stats", "event_type_pivot", "asof_join",
        "ngram_jaccard_dups", "gap_fill_locf", "cohort_retention",
        "event_transitions", "event_type_extremes",
        "value_histograms", "disjunctive_revenue"]
    # tier 1 fill: the r9 greens in recorded staleness order (the
    # late jsd/ph insertions at the window head pushed
    # winsorized_values and market_share to the tail head — both stay
    # r9, so the "no entry predates r9 after r13" promise holds)
    assert window[44:50] == [
        "retrieval_metrics", "dsir_calibration", "late_sole_suppliers",
        "value_runs_scd2", "weekly_active_users",
        "weekly_active_by_type"]
    # positions 51+: remaining r9 greens lead the r14 rotation
    assert order[50:53] == ["winsorized_values", "market_share",
                            "event_transitions_k2"]
    # r9 greens precede r10 greens precede r11 greens precede the
    # r12 window's greens
    assert order.index("sbs1_rejects") < order.index("callsign_sessions")
    assert order.index("ann_recall_lsh") > \
        order.index("window_track_lines")
    assert order.index("line_dedup_docs") < \
        order.index("bootstrap_mean_chars")
    # the r12-window greens close the registry (freshest last); every
    # entry promoted into the r13 window is absent from the tail
    assert order[-1] == "streaming_window_counts"
    tail = set(order[50:])
    for promoted in ("quality_survivors", "pagerank_docs",
                     "ks_snapshot_drift", "bpe_merges_k64",
                     "aircraft_json_parse", "capstone_export"):
        assert promoted not in tail, promoted

#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count-style materialization via
``write.format("noop")`` so every row is produced but nothing is collected
to the driver — the realistic pattern for a 100 TB sink)."""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from dump1090_db_stream_spark import get_spark, release_tracked  # noqa: E402

# Headline set: the reference's hardest query (band join), the scan-heavy
# agg, the multi-join, the window query, dedup, and the text/similarity
# extensions — a representative mix of shuffle, join, window, and scan.
HEADLINE = [
    "flights_band_join",
    "pricing_summary",
    "revenue_by_nation",
    "window_track_lines",
    "dedup_by_key",
    "callsign_sessions",
    "doc_token_stats",
    "doc_quality",
    "ngram_jaccard_dups",
    "minhash_lsh_dups",
    "embedding_topk",
    "embedding_ivf_topk",
    "asof_join",
    "cube_order_stats",
    "window_running_stats",
    "time_rollup_multires",
    "small_quantity_revenue",
    "points_in_radius",
]


# Round-2 additions, timed separately so `value` (headline total) stays
# comparable to the r01 baseline: new entries extend coverage, they do
# not redefine the metric.
EXTENDED = [
    "embedding_neardup_pairs",
    "track_lines_wkt",
    "doc_repetition_stats",
    "mixture_sample_docs",
    "pii_scrub_stats",
    "doc_normalized",
    "doc_chunks",
    "pack_sequences",
    "tfidf_top_terms",
    "bm25_scores",
    "multimodal_features",
    # round-3 additions
    "doc_entropy",
    "doc_boilerplate_share",
    "event_value_quantiles",
    "daily_quantile_rollup",
    # round-4 additions
    "fuzzy_name_matches",
    "bigram_pmi",
    "embedding_quantized_topk",
    "funnel_conversions",
    "event_mad_outliers",
    "sliding_window_counts",
    "event_trailing_stats",
    "attribution_join",
    "corpus_merge",
    "table_profile",
    "weighted_fixed_sample",
    "doc_unigram_logprob",
    "close_encounters",
    "gap_fill_locf",
    "cohort_retention",
    "event_transitions",
    "value_histograms",
    "event_type_extremes",
    "disjunctive_revenue",
    "late_sole_suppliers",
    "value_runs_scd2",
    "weekly_active_users",
    "weekly_active_estimate",
    "weekly_active_by_type",
    "top_journey_paths",
    "winsorized_values",
    "market_share",
    "event_transitions_k2",
    "scd2_point_lookup",
    # round-5 additions
    "table_profile_approx",
    "token_budget_sample",
    "sampled_event_counts",
    "logprob_percentile_filter",
    "sessionized_events",
    # round-5 continuation wave (the lighter TPC-H single-join shapes
    # are omitted — their cost profiles duplicate existing entries)
    "line_dedup_docs",
    "concurrent_sessions",
    "quality_survivors",
    "entity_resolution",
    "quartile_stratified_sample",
    "dau_wau_stickiness",
    "session_funnel",
    "customer_distribution",
    "shipping_priority",
    "returned_item_losses",
    "trade_volume_pairs",
    "embedding_pq_topk",
    "embedding_ivfpq_topk",
    "duplicate_text_spans",
    "stripped_duplicate_spans",
    "data_expectations",
    "embedding_projected",
    "temperature_mixture_docs",
    "contrastive_negatives",
    "containment_pairs",
    "hard_negative_candidates",
    # round-6 additions (the heavier two of the seven new TPC-H
    # shapes; the single-join ones duplicate existing cost profiles)
    "product_profit_by_nation",
    "excess_share_suppliers",
    # round-7 additions: the two operators rewritten off input-grain
    # single-partition windows (judge r6 ask #8 — recorded before/after
    # for the scale fix; both were sub-second pre-fix at sf0.1)
    "dsir_auc",
    "score_normalized",
    # round-8 addition: the per-group AUC (embarrassingly parallel form)
    "dsir_auc_by_source",
    # round-9 additions: the retrieval-eval pair (per-query ranked
    # windows + ordered folds; IVF recall composition)
    "retrieval_metrics",
    "ann_recall_ivf",
    # round-10 additions: the remaining ANN recall arms, the UniMax
    # water-fill (vocabulary windows), the one-aggregate funnel
    "ann_recall_lsh",
    "ann_recall_ivfpq",
    "ann_recall_int8",
    "ann_recall_pq",
    "unimax_allocation",
    "quality_funnel",
    "vocab_coverage",
    "source_divergence",
    # r11 additions: the tokenizer seam's non-default arm, the
    # incremental-IVFPQ append round-trip (index write + append +
    # sidecar-read probe — the daily-batch maintenance cost), and the
    # classifier train+score (+ pareto acceptance) pipeline
    "word_token_stats",
    "bpe_token_stats",
    "ivfpq_append_topk",
    "quality_classifier_scores",
    "classifier_pareto_sample",
    "unimax_epoch_manifest",
    "bpe_merges",
    "bpe_vocab",
    "bpe_encoded_stats",
    "kfold_docs",
    "leakage_safe_split",
    "zorder_keys",
    "ks_drift_by_type",
    "ks_snapshot_drift",
    "w1_snapshot_drift",
    "keyness_by_source",
    "bootstrap_mean_chars",
    "chars_tokens_correlation",
    "vocab_gini",
    "exact_value_quantiles",
    # r12 addition: the end-to-end pipeline capstone (hygiene ->
    # dedup -> decontamination -> split -> mixture -> packing as one
    # composed query). The K=64 BPE contracts are deliberately NOT
    # here — their cost is the training loop itself, measured by the
    # dedicated bench_bpe_scaling probe (per-iteration flatness),
    # not a query-shape number the extended set should carry.
    "pipeline_capstone",
    "ranksum_snapshot_drift",
    "chisq_snapshot_drift",
    "packing_efficiency",
    # r13 addition: the capstone's JSONL training-shard export —
    # measures the seven recomposed stages PLUS the byte-deterministic
    # shard write and the disk-level manifest audit (real I/O, by
    # design: this is the export path's cost). bpe_merges_k64_local is
    # deliberately NOT here — its cost is one word-type collect plus
    # driver-side training, measured by bench_bpe_scaling's
    # local_k1024 arm.
    "capstone_export",
    "jsd_snapshot_drift",
    "ph_value_drift",
    # r14 additions: the unigram-LM trainer (distributed seed + three
    # distributed Viterbi E-steps — unigram_vocab re-trains on EVERY
    # call, so its number IS the full EM cost; the trained model is
    # memoized for the encode contract), the word-type +
    # broadcast-join encode pass, and the composed four-metric drift
    # dashboard
    "unigram_vocab",
    "unigram_encoded_stats",
    "drift_dashboard",
]


def run_one(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_calibration(spark, sf_dir: str) -> dict:
    """Box-speed probe (r7 verdict ask #2): a PINNED, code-frozen
    parquet scan-aggregate timed alongside the headline set. Its code
    must NEVER change across rounds, so the ratio

        calibration_sec / CALIBRATION_R8_BASELINE_SEC

    measures pure environment drift, and headline comparisons can be
    read NET of it (r7's 17.07 s looked like a regression until a
    same-box re-measure proved the sandbox had slowed; this makes that
    adjudication mechanical). Reference value and the drift formula
    live in BASELINE.md."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    def q():
        return (li.groupBy("l_returnflag", "l_linestatus")
                .agg(F.sum("l_quantity").alias("sq"),
                     F.sum("l_extendedprice").alias("se"),
                     F.avg("l_discount").alias("ad"),
                     F.count(F.lit(1)).alias("n")))

    run_one(q())  # codegen warmup, untimed
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        run_one(q())
        runs.append(round(time.perf_counter() - t0, 3))
    return {"sec": min(runs), "runs_sec": runs,
            "workload": "lineitem_scan_agg_frozen_r8"}


def bench_scheduler(spark) -> dict:
    """Scheduler-latency probe (r12 verdict ask #1): 32 trivial
    ONE-TASK jobs, timed end to end, min-of-5. Like
    :func:`bench_calibration` this code is PINNED and must NEVER
    change across rounds — but where the scan-agg probe is
    throughput-bound (normalizes scan/CPU drift), this one is
    job-overhead-bound: each job is a 1-row, 1-partition count whose
    cost is pure driver planning + scheduling + task round-trip. The
    pair spans both drift axes: sub-second, job-overhead-dominated
    bench entries move with THIS probe; multi-second scan-dominated
    entries move with the scan probe — and scripts/bench_drift.py
    adjusts each entry by the axis matching its shape (r12
    false-flagged 53 entries because the scan probe alone read FASTER
    while scheduler latency drifted slower). Reference value and the
    per-shape drift formula live in BASELINE.md (r13 addendum)."""

    def q() -> None:
        for _ in range(32):
            spark.range(0, 1, 1, 1).count()

    q()  # warmup: first-job codegen/session init must not bias run 1
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        q()
        runs.append(round(time.perf_counter() - t0, 3))
    return {"sec": min(runs), "runs_sec": runs, "jobs": 32,
            "workload": "32_one_task_jobs_frozen_r13"}


def bench_auc_hicard(spark, n_rows: int = 5_000_000) -> dict:
    """Continuous-score AUC at high cardinality (r7 verdict ask #1's
    done-criterion): a synthetic score column with ~n distinct doubles
    — the exact shape where the pre-r8 plan funneled the whole
    distinct-score relation through ONE ordered task. Records wall
    time AND the count of input-grain single-partition sort sites in
    the executed plan (must stay 0)."""
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.evaluation import auc_score

    df = spark.range(n_rows).select(
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000_007)).cast("double")
         / 1_000_000_007).alias("score"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(3)) == 0).alias("y"))
    q = auc_score(df, "score", "y")
    # plan audit with the SAME detector the registry gate uses
    plan = q._jdf.queryExecution().executedPlan().toString()
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_plans import single_partition_window_sites
    sites = single_partition_window_sites(plan)
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        run_one(auc_score(df, "score", "y"))
        release_tracked()
        runs.append(round(time.perf_counter() - t0, 3))
    return {"rows": n_rows, "distinct_scores": "~n (continuous)",
            "sec": min(runs), "runs_sec": runs,
            "single_partition_input_grain_sorts": len(sites)}


def bench_auc_by_hicard(spark, n_rows: int = 5_000_000) -> dict:
    """Grouped continuous-score AUC under group SKEW (r8 verdict ask
    #3's done-criterion): 5M rows, ONE group holding 80% of them,
    scores ~all-distinct doubles — the shape where the pre-r9
    auc_score_by funneled the dominant group's whole distinct-score
    relation through one per-group ordered task. Records wall time
    plus BOTH plan-gate counters (textual single-partition sorts and
    the r9 grouped-continuous-funnel sites — each must stay 0)."""
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.evaluation import auc_score_by
    from dump1090_db_stream_spark.plans.audit import (
        grouped_continuous_window_funnels,
    )

    # group 0 takes 8/10 of the hash range -> ~80% of rows
    df = spark.range(n_rows).select(
        F.when(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10)) < 8,
               F.lit("dominant"))
         .otherwise(F.concat(F.lit("src_"),
                             F.pmod(F.xxhash64("id", F.lit(5)),
                                    F.lit(19)).cast("string")))
         .alias("src"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000_007)).cast("double")
         / 1_000_000_007).alias("score"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(3)) == 0).alias("y"))
    q = auc_score_by(df, "score", "y", "src")
    plan = q._jdf.queryExecution().executedPlan().toString()
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests"))
    from test_plans import single_partition_window_sites
    sites = single_partition_window_sites(plan)
    funnels = grouped_continuous_window_funnels(q)
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        run_one(auc_score_by(df, "score", "y", "src"))
        release_tracked()
        runs.append(round(time.perf_counter() - t0, 3))
    return {"rows": n_rows, "dominant_group_share": 0.8,
            "distinct_scores": "~n (continuous)",
            "sec": min(runs), "runs_sec": runs,
            "single_partition_input_grain_sorts": len(sites),
            "grouped_continuous_funnels": len(funnels)}


def bench_ingest(spark, n_msgs: int = 2_000_000) -> dict:
    """Parse-pipeline throughput: n synthetic SBS-1 wire lines (the
    golden fixture lines cycled) through the full parser
    (split/width-filter/null-normalize/try_cast/timestamp) into a noop
    sink. The reference's ingest path commits one row per INSERT
    (dump1090-postgres.py:116) against an O(10-100) msg/s radio feed;
    this measures our single-node ceiling for the same transformation."""
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.functions.parser import parse_sbs1
    from tests.fixtures import SAMPLE_LINES

    lines = F.array(*[F.lit(ln) for ln in SAMPLE_LINES])
    df = spark.range(n_msgs).select(
        F.element_at(lines, (F.col("id") % len(SAMPLE_LINES) + 1)
                     .cast("int")).alias("value"))
    # Warm-up + min-of-2, same discipline as the query timings (cc00682):
    # without it this number inherits whatever JVM/GC state the preceding
    # benches leave behind (r2 recorded a phantom 2.4x "regression" on a
    # byte-identical parser purely from cold-measurement drift).
    run_one(parse_sbs1(df.limit(100_000)))  # codegen/JIT warmup, untimed
    # min-of-3 WITH the per-run array recorded — same discipline as the
    # query timings. r4's two independent runs of identical code measured
    # 543k vs 733k msg/s; min-of-2 without the spread could not tell
    # sandbox noise from a parser regression.
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_one(parse_sbs1(df))
        runs.append(round(time.perf_counter() - t0, 3))
    best = min(runs)
    return {"msgs": n_msgs, "sec": best, "runs_sec": runs,
            "msgs_per_sec": round(n_msgs / best),
            "timing": "min_of_3_runs_after_warmup"}


def bench_skew(spark, n_rows: int = 2_000_000, n_keys: int = 10_000,
               hot_sessions: int = 512, salt_buckets: int = 8) -> dict:
    """Skew stress for the band join (operators.sessions.band_join).

    Workload: one hot key owns 10% of all fixes AND has ``hot_sessions``
    candidate sessions (the pathological aircraft/user), so the unsalted
    sort-merge join funnels hot_rows x hot_sessions comparisons into ONE
    task. Three timed configs on identical data, identical results:
      unsalted      — AQE on (its skew-join split is the first defense)
      unsalted_noaqe— raw skew cost when no runtime re-plan exists
      salted        — explicit (key, salt) refinement, salt_buckets ways
    Broadcast is disabled for the measurement: at bench scale the session
    side fits a broadcast (which sidesteps the shuffle entirely and is
    exactly what band_join picks by default); the skew path matters at
    the 100 TB shape where the session side exceeds broadcast."""
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.sessions import band_join

    base = 1_700_000_000
    fixes = spark.range(n_rows).select(
        F.when(F.col("id") % 10 == 0, F.lit(0))
         .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)) + 1)
         .alias("user_id"),
        F.timestamp_seconds(F.lit(base) + F.col("id") % 86_400).alias("ts"),
    )
    cold = spark.range(1, n_keys + 1).select(
        F.col("id").alias("user_id"),
        F.timestamp_seconds(F.lit(base)).alias("first_seen"),
        F.timestamp_seconds(F.lit(base + 86_400)).alias("last_seen"),
        F.concat(F.lit("s"), F.col("id")).alias("label"),
    )
    hot = spark.range(hot_sessions).select(
        F.lit(0).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(base) + F.col("id") * 1200).alias("first_seen"),
        F.timestamp_seconds(F.lit(base) + F.col("id") * 1200 + 1200).alias("last_seen"),
        F.concat(F.lit("h"), F.col("id")).alias("label"),
    )
    sessions = cold.union(hot)
    # materialize inputs so the timings measure the JOIN, not the
    # synthetic-data generation re-running per config
    fixes = fixes.persist()
    sessions = sessions.persist()
    fixes.count(), sessions.count()

    def timed(salt: int | None, aqe: bool) -> float:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        t0 = time.perf_counter()
        run_one(band_join(fixes, sessions, key="user_id", ts="ts",
                          band="INTERVAL 5 MINUTES", distinct=False,
                          salt_buckets=salt))
        return round(time.perf_counter() - t0, 3)

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        timed(None, aqe=True)  # codegen/shuffle warmup, untimed
        out = {
            "rows": n_rows,
            "unsalted_sec": timed(None, aqe=True),
            "unsalted_noaqe_sec": timed(None, aqe=False),
            "salted_sec": timed(salt_buckets, aqe=True),
            "salt_buckets": salt_buckets,
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        fixes.unpersist(blocking=False)
        sessions.unpersist(blocking=False)
    return out


def bench_ngram_skew(spark, n_docs: int = 3000) -> dict:
    """Stop-phrase skew stress for the n-gram inverted-index self-join
    (operators.dedup.ngram_jaccard_pairs). Every document shares a
    6-token phrase, so 4 trigram shingles each have df = n_docs — the
    uncapped index funnels 4 * C(n_docs, 2) pair rows through the join
    (the hazard the finite ``max_df`` default exists for). Two timed
    configs on identical data:
      capped_sec   — the default (max_df=1000 drops the hot shingles)
      uncapped_sec — max_df=None exact mode (every hot pair materialized)
    """
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over u"), F.col("id"),
            F.lit(" v"), F.col("id"), F.lit(" w"), F.col("id"),
            F.lit(" x"), F.col("id"), F.lit(" y"), F.col("id"),
        ).alias("text"),
    ).persist()
    docs.count()

    def timed(max_df: int | None) -> float:
        t0 = time.perf_counter()
        run_one(ngram_jaccard_pairs(docs, n=3, threshold=0.0,
                                    max_df=max_df))
        release_tracked()
        return round(time.perf_counter() - t0, 3)

    try:
        timed(1000)  # codegen warmup, untimed
        out = {"n_docs": n_docs,
               "capped_sec": timed(1000),
               "uncapped_sec": timed(None)}
    finally:
        docs.unpersist(blocking=False)
    return out


def bench_close_encounters_joinbound(spark, sf_dir: str) -> dict:
    """Join-machinery timing for close_encounters. The CONTRACT query's
    parameters (2000 km / 2 h — sized so the sf0.01 brute-force oracle
    stays tractable) make its sf0.1 bench entry OUTPUT-bound (~692k
    result pairs): it measures answer volume, not the join. This entry
    times the realistic loss-of-separation shape (10 km / 5 min —
    output is tiny) so a regression in the bucket/cell join machinery
    itself stays visible in the round record."""
    from dump1090_db_stream_spark.operators.geo import close_encounters

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # synthesize coordinates from stable ids (events has no lat/lon):
    # deterministic, spread over a ~100x100 km region so cells are hot
    # but the result set stays small
    from pyspark.sql import functions as F

    pts = events.select(
        "event_id", "user_id", "ts",
        (50.0 + (F.pmod(F.xxhash64("event_id"), 90000)) / 100000.0)
        .alias("lat"),
        (10.0 + (F.pmod(F.xxhash64("event_id", F.lit(1)), 140000))
         / 100000.0).alias("lon"),
    ).persist()
    n = pts.count()

    def timed() -> float:
        t0 = time.perf_counter()
        run_one(close_encounters(pts, dist_km=10.0, window_seconds=300))
        return round(time.perf_counter() - t0, 3)

    try:
        timed()  # codegen warmup, untimed
        runs = [timed(), timed()]
    finally:
        pts.unpersist(blocking=False)
    return {"rows": n, "dist_km": 10.0, "window_sec": 300,
            "runs_sec": runs, "sec": min(runs)}


def bench_bpe_scaling(spark, n_words: int = 3000) -> dict:
    """Per-iteration flatness of the incremental BPE trainer (r11
    verdict ask #2's bench half): train K=16 and K=64 on the SAME
    synthetic Zipf vocabulary and report sec/merge at both depths.
    The classic trainer re-folds all k prior merges each iteration
    (per-iteration cost linear in k, O(K^2) total); the pair-delta
    trainer's per-iteration cost must stay roughly constant, so
    ``flatness`` (= sec_per_merge@64 / sec_per_merge@16) should sit
    near 1.0 — values well above ~1.5 mean the incremental discipline
    regressed. Synthetic words (base-26 expansions of a multiplicative
    hash, Zipf-ish freqs) so the vocabulary is REAL-sized even though
    the fixture corpora have tiny type tables."""
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.bpe import (
        train_bpe_from_words,
        with_symbols,
    )

    ids = spark.range(n_words)
    # 6..10-char deterministic pseudo-words over a-z
    h = (F.col("id") * F.lit(2654435761) + F.lit(97)) % F.lit(26 ** 10)
    word = F.concat(*[
        F.chr(F.lit(97) + (h / F.lit(26 ** i)).cast("long") % F.lit(26))
        for i in range(10)])
    words = with_symbols(
        ids.select(
            F.substring(word, 1, 6 + (F.col("id") % 5).cast("int"))
            .alias("word"),
            (F.lit(n_words) / (F.col("id") + 1) + 1).cast("long")
            .alias("freq"))
        .groupBy("word").agg(F.sum("freq").alias("freq")))

    def timed(k: int) -> tuple[float, int]:
        t0 = time.perf_counter()
        merges = train_bpe_from_words(words, k)
        return round(time.perf_counter() - t0, 3), len(merges)

    timed(2)   # codegen/scheduler warmup — must not bias the K=16 arm
    sec16, n16 = timed(16)
    sec64, n64 = timed(64)
    per16 = sec16 / max(n16, 1)
    per64 = sec64 / max(n64, 1)
    # production-K arm (r12 verdict ask #4): collect the vocabulary-
    # bounded word table once and run classic fast BPE driver-locally
    # (train_bpe_local_from_words) at K=1024 — the capability-range
    # path whose distributed equivalent would be 1024 scheduling
    # round-trips. Records collect + train seconds so a regression in
    # either half of the escape hatch is visible round-over-round.
    from dump1090_db_stream_spark.operators.bpe import (
        train_bpe_local_from_words,
    )

    t0 = time.perf_counter()
    rows = [(r["freq"], r["syms"])
            for r in words.select("freq", "syms").collect()]
    collect_sec = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    local_merges = train_bpe_local_from_words(rows, 1024)
    local_sec = round(time.perf_counter() - t0, 3)
    return {"n_words": n_words,
            "k16_sec": sec16, "k64_sec": sec64,
            "k16_merges": n16, "k64_merges": n64,
            "sec_per_merge_k16": round(per16, 4),
            "sec_per_merge_k64": round(per64, 4),
            "flatness_k64_over_k16": round(per64 / max(per16, 1e-9), 3),
            "local_collect_sec": collect_sec,
            "local_k1024_sec": local_sec,
            "local_k1024_merges": len(local_merges)}


def bench_fuzzy_candidates(spark, sf_dir: str) -> dict:
    """Round-over-round record of edit_distance_join's candidate volume
    on the contract key set (customer names — the documented low-
    alphabet case both fuzzy contract queries accept explicitly). Runs
    the guardrail's closed-form estimate (sum over prefix buckets of
    c*(c-1)/2 — the exact upper bound on expansion-join output) at the
    q the contract queries use and one q higher, so a drift in
    candidate behavior (fixture regeneration, prefix-filter change)
    shows up as a ratio change here before it shows up as
    entity_resolution wall-clock."""
    from dump1090_db_stream_spark.operators.fuzzy import (
        estimate_candidate_pairs,
    )

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    out = {}
    for q, k in ((3, 1), (4, 1)):
        t0 = time.perf_counter()
        # the SAME helper the in-join guard calls — the bench records
        # exactly what the guard would measure, so they cannot drift
        n_rows, est = estimate_candidate_pairs(
            cust, "c_custkey", "c_name", k=k, q=q)
        release_tracked()
        out["n_rows"] = n_rows
        out[f"q{q}"] = {"est_candidates": est,
                        "ratio": round(est / max(n_rows, 1), 1),
                        "estimate_sec": round(time.perf_counter() - t0, 3)}
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # SMOKE MODE (tests/test_bench_smoke.py): 1 run per query and
    # shrunken synthetic benches, so a bench.py regression is caught in
    # the suite instead of costing the round its BENCH file.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    synth_scale = int(os.environ.get("SPARK_GRAFT_BENCH_SYNTH", "1"))
    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]

    # JVM/codegen warmup: run EVERY headline query once at the smallest SF
    # so sf-target timings measure the data path, not first-run Catalyst
    # planning + whole-stage-codegen compilation (which amortize to zero
    # at real scale but dominate sub-second queries when cold).
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm):
        for n in names:
            run_one(qs[n](spark, warm))

    release_tracked()  # warmup caches must not serve the timed runs

    # self-calibration BRACKET (r11 verdict ask #4: the authoritative
    # driver record must distinguish session contention from real
    # regressions without a second session): the frozen probe runs
    # BEFORE the first timed query and again AFTER the last one — a
    # contended box shows up as start/end disagreement and as per-run
    # spread, both of which ride in the compact record itself.
    calibration_start = bench_calibration(spark, sf_dir)
    scheduler_start = bench_scheduler(spark)

    def timed_runs(fn, runs: int = None) -> list[float]:
        """All ``runs`` execution times, in run order. The headline
        metric uses the min (machine-noise-robust: co-tenant load only
        ever ADDS time), but the FULL array is recorded in the output —
        r3's headline drifted +13% on code-untouched queries and the
        min-only record could not distinguish sandbox noise from a real
        regression. The per-run spread makes variance visible. Caches
        are released between runs so each run does the full work."""
        out = []
        for _ in range(runs or n_runs):
            t0 = time.perf_counter()
            run_one(fn())
            # operators own persist(), callers own release: free
            # operator intermediates so no run is timed against
            # another's storage
            release_tracked()
            out.append(round(time.perf_counter() - t0, 3))
        return out

    timings: dict[str, float] = {}
    runs_detail: dict[str, list[float]] = {}
    for n in names:
        runs_detail[n] = timed_runs(lambda: qs[n](spark, sf_dir))
        timings[n] = min(runs_detail[n])

    ext_names = [n for n in EXTENDED if n in qs]
    for n in ext_names:  # same warmup discipline as the headline set
        run_one(qs[n](spark, warm)) if os.path.isdir(warm) else None
    release_tracked()
    extended: dict[str, float] = {}
    for n in ext_names:
        runs_detail[n] = timed_runs(lambda: qs[n](spark, sf_dir))
        extended[n] = min(runs_detail[n])

    calibration = bench_calibration(spark, sf_dir)
    scheduler = bench_scheduler(spark)
    ingest = bench_ingest(spark, n_msgs=2_000_000 // synth_scale)
    skew = bench_skew(spark, n_rows=2_000_000 // synth_scale)
    ngram_skew = bench_ngram_skew(spark, n_docs=3000 // synth_scale)
    enc_joinbound = bench_close_encounters_joinbound(spark, sf_dir)
    fuzzy_cands = bench_fuzzy_candidates(spark, sf_dir)
    auc_hicard = bench_auc_hicard(spark, n_rows=5_000_000 // synth_scale)
    auc_by_hicard = bench_auc_by_hicard(
        spark, n_rows=5_000_000 // synth_scale)
    bpe_scaling = bench_bpe_scaling(spark, n_words=3000 // synth_scale)
    # the same-box ingest A/B (HEAD vs the r5 snapshot commit) is a
    # committed one-off measurement; surface the NEWEST one in the
    # round record so the BENCH file carries both arrays (r7 verdict
    # ask #3; measured for real in r9). Newest = highest NUMERIC round
    # (lexicographic misorders at r100+, r9 ADVICE), and a record
    # measured at an older HEAD is only trusted if the measured code
    # path is still byte-identical — otherwise it's marked stale.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    # keep only canonical round-numbered records: a stray artifact
    # like ingest_ab_r10_retry.json matches the glob but must not
    # crash the sort key or masquerade as the newest round
    ab_glob = [p for p in glob.glob(os.path.join(
        repo_dir, "scripts", "ingest_ab_r*.json"))
        if re.search(r"ingest_ab_r(\d+)\.json$", p)]
    ab_glob.sort(key=lambda p: int(
        re.search(r"ingest_ab_r(\d+)\.json$", p).group(1)))
    ingest_ab = None
    if ab_glob:
        with open(ab_glob[-1]) as fh:
            ingest_ab = json.load(fh)
        # the ~500-char verdict prose lives in the committed artifact;
        # dropping it here keeps the round record bounded so the
        # driver's stdout-tail window can never evict the extended
        # set again (the BENCH_r09 regression)
        ingest_ab.pop("verdict", None)
        # the measured-path list is read from the artifact itself
        # (recorded at measurement time by scripts/ingest_ab.py) — a
        # list hardcoded HERE goes stale if the measured code is later
        # moved/split, and a stale list diffs clean and falsely marks
        # the record fresh (r10 ADVICE). Key absent -> None ("could
        # not determine"), never True.
        measured_paths = ingest_ab.get("measured_paths")
        if not measured_paths:
            ingest_ab["measured_path_unchanged_vs_head"] = None
        else:
            try:
                import subprocess
                rc = subprocess.run(
                    ["git", "diff", "--quiet",
                     f"{ingest_ab['head_commit']}..HEAD", "--",
                     *measured_paths],
                    cwd=repo_dir, capture_output=True).returncode
                # git diff --quiet: 0 = identical, 1 = paths differ,
                # anything else (128 = unknown commit after a rewrite
                # / shallow clone) = COULD NOT DETERMINE — record
                # None, not a false "the measured code changed"
                ingest_ab["measured_path_unchanged_vs_head"] = (
                    True if rc == 0 else False if rc == 1 else None)
            except Exception:
                ingest_ab["measured_path_unchanged_vs_head"] = None

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full detail FIRST, compact headline record LAST: the driver's tail
    # capture truncated BENCH_r04.json (parsed: null) because the per-run
    # arrays pushed the one-line record past its window and ate `value` —
    # the number the 2x contract is judged on. The last stdout line is
    # now a bounded-size summary that can never be displaced by detail.
    # key order is tail-survival order: the driver keeps the LAST
    # ~2000 chars of stdout, so the per-run arrays (reconstructible
    # from `extended`/`queries` mins anyway) go first and the
    # extended per-query map + total go last, adjacent to the
    # bounded compact record (the BENCH_r09 eviction fix)
    # noisiest entries by relative per-run spread: under contention the
    # spread blows up and the arrays land in the COMPACT record (the
    # only part guaranteed to survive the driver's stdout tail window);
    # on an idle box the list is the natural variance leaderboard.
    # Bounded at 5 so the compact record can never outgrow the tail.
    def _spread(rs: list[float]) -> float:
        return (max(rs) - min(rs)) / max(min(rs), 1e-9)

    noisy_top = {
        n: runs_detail[n]
        for n in sorted(runs_detail, key=lambda n: -_spread(runs_detail[n]))
        [:5]}

    detail = {
        "metric": "headline_queries_detail",
        "timing": f"min_of_{n_runs}_runs",
        "queries_runs": runs_detail,
        "calibration_start": calibration_start,
        "calibration": calibration,
        "scheduler_calibration_start": scheduler_start,
        "scheduler_calibration": scheduler,
        "ingest": ingest,
        "ingest_ab": ingest_ab,
        "skew": skew,
        "ngram_skew": ngram_skew,
        "close_encounters_joinbound": enc_joinbound,
        "fuzzy_candidate_volume": fuzzy_cands,
        "auc_hicard": auc_hicard,
        "auc_by_hicard": auc_by_hicard,
        "bpe_scaling": bpe_scaling,
        "extended": extended,
        "extended_total": round(sum(extended.values()), 3),
        "sf": sf_val,
    }
    print(json.dumps(detail))
    # truncation-proof copy: the driver keeps only the last ~2000
    # chars of stdout, which BENCH_r09 proved can evict the detail
    # record — so every run also writes it to a committed file
    # (overwritten per run; the per-round history is git).
    # SPARK_GRAFT_DETAIL_OUT reroutes it so smoke/test runs never
    # clobber the committed real-SF record.
    detail_out = os.environ.get(
        "SPARK_GRAFT_DETAIL_OUT",
        os.path.join(repo_dir, "BENCH_DETAIL_LAST.json"))
    try:
        with open(detail_out, "w") as fh:
            json.dump(detail, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: stdout still carries the record
    # compact record LAST — bounded size (the 77-query extended map
    # CANNOT fit a 2000-char tail; it lives in the detail line and
    # the committed BENCH_DETAIL_LAST.json), but the extended TOTAL
    # rides here so the headline record alone shows extended drift
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "extended_total": round(sum(extended.values()), 3),
        # bracket probes + the 5 noisiest per-run arrays: the compact
        # record is self-calibrating (r11 ask #4) — a mover whose runs
        # read e.g. [1.9, 0.6, 0.6] alongside calibration_start/end
        # disagreement is contention, not a regression, adjudicable
        # from THIS file alone
        "calibration_start_sec": calibration_start["sec"],
        "calibration_sec": calibration["sec"],
        # second frozen probe (r12 ask #1): scheduler-latency bracket —
        # sub-second entries drift with THIS axis, not the scan probe
        "scheduler_start_sec": scheduler_start["sec"],
        "scheduler_sec": scheduler["sec"],
        "noisy_top_runs": noisy_top,
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()

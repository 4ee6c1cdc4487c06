"""Model-eval analytics over corpus-scale score tables.

A training-data pipeline does not stop at producing scores (quality
classifiers, DSIR weights, LM logprobs) — it has to EVALUATE them
against labels at corpus scale: ranking power (AUC) and probability
calibration (reliability bins, ECE). Both are rank/bin aggregations
that Spark expresses exactly; nothing here samples or approximates.

- auc_score          exact tie-aware ROC AUC from the rank-sum identity
                     (Mann-Whitney U): average ranks make ties exact,
                     every intermediate is integer-or-half, so the
                     result is deterministic to the last bit.
- calibration_bins   equal-width reliability bins over [0, 1] scores:
                     per-bin count, mean confidence, empirical accuracy.
- expected_calibration_error
                     the one-row ECE fold over those bins.

Scale shape: AUC is one map-side-combined groupBy(score) — the ONLY
full-size shuffle — then a rank window over the distinct-score
relation (vocabulary-sized, the weekly_growth discipline) and one
aggregate; calibration is a single map-side-combined bin aggregate.
No collects, no cross joins, no input-grain global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def auc_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """One row: (n_pos, n_neg, auc rounded 6) — the exact tie-aware ROC
    AUC via the rank-sum identity

        AUC = (sum of positives' average ranks - P(P+1)/2) / (P * N)

    Average rank over a tie group of ``cnt`` rows starting after
    ``prev`` lower-scored rows is prev + (cnt + 1) / 2 — so ties
    contribute the exact 1/2 credit the trapezoidal ROC assigns them,
    and every intermediate stays integer-or-half (bit-deterministic;
    the only float op is the final division). Rows with NULL score or
    label are excluded (they carry no ranking information).

    Scale shape: AUC depends only on per-distinct-score (rows,
    positives) counts, so the input collapses through ONE map-side-
    combined groupBy(score) before any ordering; the cumulative-count
    window then runs over the distinct-score relation
    (vocabulary-sized — never input-grain rows through one task).

    Single-class input (n_pos == 0 or n_neg == 0): AUC is undefined —
    the row is emitted with ``auc = NULL`` (``try_divide``), so a
    consumer gating on ``auc >= x`` must treat NULL as "not
    evaluable", not as a pass.
    """
    base = df.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("boolean").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    per_score = base.groupBy("s").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum(F.col("y").cast("long")).alias("_pos"))
    w_prev = (Window.orderBy("s")
              .rowsBetween(Window.unboundedPreceding, -1))
    ravg = (F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0))
            .cast("double")
            + (F.col("_cnt") + 1).cast("double") / 2)
    return (per_score
            .select("_cnt", "_pos", ravg.alias("_ravg"))
            .agg(F.sum("_pos").alias("n_pos"),
                 F.sum(F.col("_cnt") - F.col("_pos")).alias("n_neg"),
                 F.sum(F.col("_pos") * F.col("_ravg")).alias("_rsum"))
            .select(
                "n_pos", "n_neg",
                F.round(
                    F.try_divide(
                        F.col("_rsum")
                        - F.col("n_pos").cast("double")
                        * (F.col("n_pos") + 1) / 2,
                        F.col("n_pos").cast("double") * F.col("n_neg")),
                    6).alias("auc")))


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram data: for scores in [0, 1], one row per
    equal-width bin with (bin, n, confidence = mean score rounded 6,
    accuracy = positive fraction rounded 6). Score exactly 1.0 lands
    in the top bin; NULL scores/labels are excluded. Only non-empty
    bins are emitted."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    base = df.select(
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("boolean").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    b = F.least(F.floor(F.col("s") * n_bins), F.lit(n_bins - 1)) \
        .cast("int")
    return (base.groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("s"), 6).alias("confidence"),
                 F.round(F.avg(F.col("y").cast("double")), 6)
                  .alias("accuracy")))


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """One row: (n, ece rounded 6) — the weighted reliability gap
    ECE = sum over bins of (n_b / N) * |accuracy_b - confidence_b|,
    folded from :func:`calibration_bins` (confidence/accuracy already
    rounded 6, so both engines fold identical values)."""
    bins = calibration_bins(df, score_col, label_col, n_bins)
    return (bins.agg(
        F.sum("n").alias("n"),
        F.round(
            F.sum(F.col("n")
                  * F.abs(F.col("accuracy") - F.col("confidence")))
            / F.sum("n"), 6).alias("ece")))

"""Deterministic Poisson-bootstrap confidence intervals.

A corpus statistic without an uncertainty band invites bad decisions —
"source A's mean quality beat source B's" means nothing when both
estimates wobble more than they differ. The scalable resampling scheme
is the POISSON bootstrap (Chamandy et al. 2012, "Estimating Uncertainty
for Massive Data Streams"): instead of drawing n rows with replacement
(which needs global coordination), every row independently receives a
Poisson(1) weight per replicate — at large n the replicate weight
vectors are indistinguishable from multinomial resamples, and the whole
procedure becomes one embarrassingly-parallel scan.

Everything here is HASH-driven, never RNG-driven (the
``operators.sampling`` discipline): the per-(row, replicate) weight is
the inverse-CDF of Poisson(1) applied to a uniform derived from the
seeded portable hash, so the resample is reproducible across reruns,
cluster layouts, AND engines — which is what lets the DuckDB oracle
replay every replicate mean bit-for-bit. The inverse-CDF is a
monotone-threshold ladder over PRECOMPUTED double literals (the same
device the prefix-sum's bucketing and PSI binning use), truncated at
w = 11 (P(Poisson(1) > 10) < 1.1e-10 — far below any statistical
noise a 200-replicate bootstrap can resolve).

Scale shape: the replicate explosion is n_boot x rows WIDE but feeds
straight into a map-side-combined hash aggregate keyed (group,
replicate), so the shuffle carries only groups x n_boot rows; the
replicate-mean ranking windows run over n_boot rows per group
(bounded by the parameter, never by data). Weighted sums accumulate
in DECIMAL (exact, partition-order independent); the only doubles are
final divisions of exactly-represented values.

No reference counterpart (the reference has no statistics surface) —
extension tier, alongside operators.evaluation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.sampling import (
    _P,
    portable_hash_seeded,
    portable_hash_seeded_sql,
)

#: Truncation point of the Poisson(1) inverse CDF: weights are capped
#: at _MAX_W (tail mass < 1.1e-10).
_MAX_W = 11


def poisson1_thresholds() -> list[float]:
    """Cumulative Poisson(1) probabilities c_k = e^-1 * sum_{j<=k} 1/j!
    for k = 0.._MAX_W-1, as the exact doubles BOTH engines compare
    against (the ladder weight is ``sum_k [u > c_k]``). Computed once
    from math.exp/factorial — pure Python, embedded as literals on the
    Spark side and via repr() in the oracle SQL, so there is no
    cross-engine arithmetic to diverge."""
    e1 = math.exp(-1.0)
    acc, out = 0.0, []
    for k in range(_MAX_W):
        acc += e1 / math.factorial(k)
        out.append(acc)
    return out


def _u_col(id_col: str, n_boot: int, seed: int):
    """u in (0, 1]: the seeded portable hash of the (row, replicate)
    composite key id*n_boot + r, shifted off 0. Precondition (doc'd):
    |id| < 2^62 / n_boot so the composite stays in BIGINT — true for
    any surrogate key a real table carries."""
    key = F.col(id_col).cast("long") * F.lit(n_boot) + F.col("_r")
    return ((portable_hash_seeded(key, seed) + 1).cast("double")
            / F.lit(float(_P)))


def _u_sql(id_expr: str, n_boot: int, seed: int) -> str:
    h = portable_hash_seeded_sql(
        f"CAST({id_expr} AS BIGINT) * {n_boot} + r", seed)
    return f"(CAST(({h}) + 1 AS DOUBLE) / {float(_P)!r})"


def poisson_weight(u) -> "F.Column":
    """Ladder inverse-CDF: number of thresholds strictly below u."""
    w = F.lit(0)
    for c in poisson1_thresholds():
        w = w + F.when(u > F.lit(c), F.lit(1)).otherwise(F.lit(0))
    return w


def poisson_weight_sql(u_expr: str) -> str:
    """ANSI-SQL twin of :func:`poisson_weight` — same literals via
    repr(), same strict comparison."""
    terms = " + ".join(
        f"CASE WHEN {u_expr} > {c!r} THEN 1 ELSE 0 END"
        for c in poisson1_thresholds())
    return f"({terms})"


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_boot: int = 200,
    alpha: float = 0.05,
    seed: int = 1,
) -> DataFrame:
    """Per-group mean of ``value_col`` with a percentile Poisson-
    bootstrap confidence interval — one row per group:
    ``(group, n, mean, ci_lo, ci_hi, n_boot)``.

    Each of the ``n_boot`` replicates reweights every row by a
    deterministic Poisson(1) draw (hash of ``id_col`` x replicate x
    ``seed``); the replicate mean is the weighted mean; the CI is the
    percentile interval over the replicate means with PYTHON-computed
    integer ranks lo = max(1, floor(alpha/2 * n_boot)) and
    hi = n_boot + 1 - lo (ranks ordered by (mean, replicate id) — the
    unique tiebreak keeps both engines' row_number identical). NULL
    values carry no weight (excluded before the explode). A replicate
    whose total weight lands on 0 (possible only for tiny groups)
    would shift the rank grid, so a group where ANY replicate is
    degenerate emits NULL bounds rather than silently re-ranking —
    the single-class-AUC contract shape.

    DETERMINISM: weighted sums are DECIMAL(28,6)-exact (values are
    quantized to 6 dp on entry — pass integral or pre-rounded values
    for bit-exact oracles); each replicate mean is ONE double division
    of exactly-represented values; the CI bounds are replicate means,
    not interpolations. ``mean``/``ci_lo``/``ci_hi`` round to 6.
    """
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    if n_boot < 2:
        raise ValueError(f"n_boot must be >= 2, got {n_boot}")
    lo_rank = max(1, int(math.floor(alpha / 2 * n_boot)))
    hi_rank = n_boot + 1 - lo_rank

    base = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("decimal(28,6)").alias("v"),
    ).filter(F.col("g").isNotNull() & F.col("v").isNotNull())

    from dump1090_db_stream_spark.cache import track

    base = track(base)  # feeds the point estimate AND the replicates
    point = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("v").cast("double")
         / F.count(F.lit(1)).cast("double")).alias("_mean"))

    reps = base.withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))))
    w = poisson_weight(_u_col("_id", n_boot, seed))
    rep_means = (reps
                 .select("g", "_r", "v", w.alias("_w"))
                 .groupBy("g", "_r")
                 .agg(F.sum("_w").cast("long").alias("_sw"),
                      F.sum(F.col("_w") * F.col("v")).alias("_swv"))
                 .select("g", "_r", "_sw",
                         F.when(F.col("_sw") > 0,
                                F.col("_swv").cast("double")
                                / F.col("_sw").cast("double"))
                         .alias("_m")))
    from pyspark.sql import Window

    # degenerate (zero-total-weight) replicates are FILTERED before
    # ranking (r11 ADVICE): engines disagree on where NULL sorts
    # (Spark asc = NULLS FIRST, DuckDB/ANSI asc = NULLS LAST), so
    # ranking only non-null means keeps both engines' row_number
    # identical unconditionally instead of relying on the _bad > 0
    # NULL-out to mask the divergence; _bad falls out as the count
    # deficit (n_boot - surviving replicates)
    nn = rep_means.filter(F.col("_m").isNotNull())
    # n_boot rows per group: bounded by the parameter, not the data
    rk = F.row_number().over(
        Window.partitionBy("g").orderBy(F.col("_m").asc(),
                                        F.col("_r").asc()))
    ci = (nn
          .withColumn("_rk", rk)
          .groupBy("g")
          .agg(F.min(F.when(F.col("_rk") == lo_rank, F.col("_m")))
               .alias("_lo"),
               F.min(F.when(F.col("_rk") == hi_rank, F.col("_m")))
               .alias("_hi"),
               (F.lit(n_boot) - F.count(F.lit(1))).alias("_bad")))
    # left join: a group whose EVERY replicate degenerated (all-zero
    # weights — possible only for near-empty groups) has no ranked
    # rows at all; it still emits (n, mean, NULL, NULL)
    return (point.join(ci, "g", "left")
            .select(F.col("g").alias(group_col), "n",
                    F.round("_mean", 6).alias("mean"),
                    F.when(F.col("_bad") == 0, F.round("_lo", 6))
                     .alias("ci_lo"),
                    F.when(F.col("_bad") == 0, F.round("_hi", 6))
                     .alias("ci_hi"),
                    F.lit(n_boot).alias("n_boot")))

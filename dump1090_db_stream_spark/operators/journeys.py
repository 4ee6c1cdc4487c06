"""User-journey analytics: cohort retention and event-transition
matrices.

Two product/behavior staples that complete the funnel family
(operators/funnel.py) — nothing in the reference covers them (its views
stop at per-day sessionization, create_schema.sql:85-93), but any
event-stream consumer asks both questions:

- cohort_retention : group users by the period of their FIRST event
  (the cohort), then for each later period count how many of the cohort
  were active — the classic triangular retention table.
- trailing_active_users : distinct actives over a trailing day window
  per calendar day — the DAU/WAU/MAU engagement metric (exact tier;
  sketches.trailing_distinct_estimate is the constant-state variant).
- top_paths : most common opening journeys (first n event types per
  user), ranked — the sequence-pattern companion to the pairwise
  transition matrix.
- event_transitions : first-order Markov transition counts/probabilities
  between consecutive events of the same user — "after a click, what
  happens next?".

Spark-first shapes:

- Retention is two aggregations and one equi join, all on aggregate-
  sized data after the first pass: (a) per-user first-event period (one
  map-side-combined shuffle over the raw table — the only full-size
  exchange), (b) distinct (user, period) activity from the same scan
  shape, (c) join activity to cohorts on user_id and count per (cohort,
  offset). Cohort sizes re-derive from offset 0 (every user is active
  in their own first period by construction), so no third pass.
- Transitions are one window pass (lead over user-partitioned,
  time-ordered events) plus one small aggregation over the type-pair
  alphabet; the probability denominator reuses a window sum over the
  aggregated pairs — |types|^2 rows, no second scan.

Determinism contract (oracle-replayable): periods are integer epoch
divisions (epoch_us // period_us) — no calendar-week folklore between
engines; event order ties break on the unique event id; probabilities
round 6 after one float divide.

Scale: one full-size shuffle each (user-keyed). The retention output is
O(periods^2 / 2) rows and the transition matrix O(|types|^2) — both
driver-safe at any corpus size. Skewed users (one user = 10^8 events)
hit the lead() window's single partition; cap per-user history upstream
with ``operators.sessions.cap_events_per_key`` (or sessionize first) if
that shape exists — top_paths applies the cap internally.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.timeseries import epoch_bucket

MICROS_PER_SEC = 1_000_000


def _period(ts_col: str, period_seconds: int):
    # shared floor-division bucketing (epoch_bucket): a bare
    # cast('long') would truncate pre-1970 timestamps toward zero and
    # diverge from the oracles' ANSI // replay
    return epoch_bucket(F.col(ts_col), period_seconds)


def cohort_retention(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 86400,
) -> DataFrame:
    """Triangular retention: one row per (cohort_start, period_offset).

    - ``cohort_start``  : first-event period of the cohort (timestamp)
    - ``period_offset`` : whole periods since the cohort period (>= 0)
    - ``n_active``      : cohort users with >= 1 event in that period
    - ``n_cohort``      : cohort size (== n_active at offset 0)
    - ``retention``     : n_active / n_cohort, rounded 6
    """
    p = _period(ts_col, period_seconds)
    cohorts = events.groupBy(F.col(id_col).alias("_id")).agg(
        F.min(p).alias("_cohort"))
    activity = (events.select(F.col(id_col).alias("_id"), p.alias("_p"))
                .distinct())
    active = (
        activity.join(cohorts, "_id")
        .groupBy("_cohort", (F.col("_p") - F.col("_cohort")).alias(
            "period_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    # offset-0 count IS the cohort size: min-period membership implies
    # activity in that period, so no separate size aggregation is needed
    w = Window.partitionBy("_cohort")
    n_cohort = F.max(F.when(F.col("period_offset") == 0,
                            F.col("n_active"))).over(w)
    return active.select(
        F.timestamp_seconds(F.col("_cohort") * period_seconds)
         .alias("cohort_start"),
        "period_offset",
        "n_active",
        n_cohort.alias("n_cohort"),
        F.round(F.col("n_active").cast("double") / n_cohort, 6)
         .alias("retention"),
    )


def trailing_active_users(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    materialize: bool = True,
    keys: list[str] | None = None,
) -> DataFrame:
    """Trailing-window distinct actives (the DAU/WAU/MAU metric): for
    every day in the observed span, how many distinct users had >= 1
    event in the ``window_days`` days ending on (and including) it.
    ``keys`` segments the metric (per-event-type WAU, per-country DAU):
    every stage keys on them, and each segment gets its own dense span.

    Output: keys..., ``day`` (timestamp at midnight UTC), ``n_active``.

    Spark-first shape — the explode trick, NOT a per-day self-join and
    NOT a sliding count-distinct window (Spark has no distinct window
    aggregate): dedupe activity to (user, day) — the only full-size
    shuffle, map-side combined — then each activity day votes for the
    ``window_days`` window-end days it falls into (one ``sequence``
    explode, x window_days fan-out of the already-deduped relation) and
    one count_distinct per window-end day. The output is DENSE over the
    observed [min_day, max_day] span: a day whose whole trailing window
    is empty still emits n_active = 0 (a time-series consumer must be
    able to tell "zero actives" from "out of span") — the span grid is
    one sequence-explode of the 1-row span aggregate, left-joined to
    the vote counts. Leading windows are partial by definition;
    trailing phantom days past max_day are not emitted.

    Scale: shuffle volume = window_days x |distinct (user, day)|, far
    below raw events; for month+ windows at web scale swap the exact
    count_distinct for the mergeable sketches in operators/sketches.py
    (same grid, constant state; that tier's output is sparse —
    sampled-store days only — as its docstring documents).
    """
    if window_days < 1:
        # sequence(start, stop) auto-steps -1 when start > stop, so a
        # zero/negative window would silently vote BACKWARD in time
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    keys = keys or []
    day = epoch_bucket(F.col(ts_col), 86400)
    activity = events.select(*keys, F.col(id_col).alias("_id"),
                             day.alias("_d")).distinct()
    # activity feeds the span aggregate AND the vote explode — no
    # cross-branch reuse in Catalyst, so materialize the (user, day)
    # dedup once instead of scanning+deduping the raw relation twice
    # (caller releases via cache.release_tracked; pass
    # materialize=False for streaming inputs, where persist is illegal)
    if materialize:
        from dump1090_db_stream_spark.cache import track

        activity = track(activity)
    span = activity.groupBy(*keys).agg(
        F.min("_d").alias("_lo"), F.max("_d").alias("_hi"))
    joined = (activity.join(F.broadcast(span), on=keys)
              if keys else activity.crossJoin(F.broadcast(span)))
    votes = joined.select(
        *keys, "_id",
        F.explode(F.sequence(
            F.col("_d"),
            F.least(F.col("_d") + (window_days - 1), F.col("_hi"))
        )).alias("_w"))
    counts = votes.groupBy(*keys, "_w").agg(
        F.count_distinct("_id").alias("_n"))
    grid = span.select(
        *keys, F.explode(F.sequence("_lo", "_hi")).alias("_w"))
    return (
        grid.join(counts, [*keys, "_w"], "left")
        .select(*keys,
                F.timestamp_seconds(F.col("_w") * 86400).alias("day"),
                F.coalesce("_n", F.lit(0)).alias("n_active"))
    )


def top_paths(
    events: DataFrame,
    n_steps: int = 3,
    k: int = 10,
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
    sep: str = ">",
) -> DataFrame:
    """Most common opening journeys: each user's FIRST ``n_steps`` event
    types (time-ordered, tie-broken on ``tie_col``) joined with ``sep``,
    counted, top ``k`` with a deterministic rank (count desc, path asc).

    Users with fewer than ``n_steps`` events contribute their full
    shorter path — real journey data is ragged and dropping short users
    would silently bias the ranking toward heavy users.

    Spark-first shape: :func:`~dump1090_db_stream_spark.operators.
    sessions.cap_events_per_key` first keeps each user's earliest
    ``n_steps`` events (streaming row_number, O(1) task state), THEN
    groupBy(user) collects the time-ordered struct array — so
    aggregation state is O(n_steps) per user by construction, never the
    user's full history (a 10^8-event user costs sort time, not
    executor memory; the funnel fold genuinely needs the full array,
    this operator never did). The window's (user) partitioning
    satisfies the groupBy — one Exchange total. A vocabulary-sized path
    aggregation follows, and the top-k plans as TakeOrderedAndProject
    (never a global sort). Rank is attached on the k-row result.
    """
    from dump1090_db_stream_spark.operators.sessions import (
        cap_events_per_key,
    )

    capped = cap_events_per_key(
        events, id_col, ts_col, n_steps, tie_col=tie_col)
    # array_sort still required: collect_list order is partition-
    # nondeterministic even over the capped (<= n_steps) rows
    seq = F.array_sort(F.collect_list(F.struct(
        F.col(ts_col).alias("t"), F.col(tie_col).alias("k"),
        F.col(type_col).alias("e"))))
    path = F.array_join(F.transform(seq, lambda s: s["e"]), sep)
    paths = (
        capped.groupBy(F.col(id_col).alias("_id"))
        .agg(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(k)
    )
    w = Window.orderBy(F.col("n_users").desc(), "path")
    return paths.withColumn("rank", F.row_number().over(w))


def event_transitions(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
    order: int = 1,
    sep: str = ">",
) -> DataFrame:
    """Order-k transition matrix over consecutive same-user events:
    ``from_state`` is the ``sep``-joined window of the last ``order``
    event types, ``to_type`` the next one — order=1 is the classic
    first-order Markov matrix, order=2 answers "after view>click, what
    happens next?".

    One row per observed (from_state, to_type): ``n_transitions`` and
    ``prob`` (row-stochastic: transitions out of a state sum to 1).
    A user's first order-1 events lack full history and feed no row,
    and the last event has no successor — exactly the n-gram edge
    convention. All ``order`` lags and the lead share ONE window spec,
    so the whole matrix costs a single (user) Exchange plus a
    state-alphabet-sized aggregation (<= |types|^(order+1) rows).
    """
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    w = Window.partitionBy(id_col).orderBy(ts_col, tie_col)
    lags = [F.lag(type_col, k).over(w) for k in range(order - 1, 0, -1)]
    history = [*lags, F.col(type_col)]
    # EVERY history element must be non-null — a missing lag means not
    # enough predecessors (the n-gram edge convention), and a NULL type
    # value anywhere must not silently shrink the state (concat_ws
    # drops NULLs instead of propagating them); such rows feed no row
    full_history = reduce(lambda a, b: a & b,
                          [h.isNotNull() for h in history])
    state = F.when(full_history, F.concat_ws(sep, *history))
    pairs = (
        events.select(
            state.alias("from_state"),
            F.lead(type_col).over(w).alias("to_type"))
        .filter(F.col("from_state").isNotNull()
                & F.col("to_type").isNotNull())
        .groupBy("from_state", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    out_total = F.sum("n_transitions").over(
        Window.partitionBy("from_state"))
    return pairs.select(
        "from_state", "to_type", "n_transitions",
        F.round(F.col("n_transitions").cast("double") / out_total, 6)
         .alias("prob"),
    )


def survival_curve(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_gap_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier churn/survival curve over user lifetimes — the
    censoring-aware upgrade of cohort retention: a user whose last
    activity sits within ``censor_gap_days`` of the observation-window
    end is CENSORED (still plausibly active), contributing to the
    at-risk denominator up to their observed lifetime without counting
    as churn. Naive retention treats them as churned and biases every
    recent cohort downward; KM is the standard estimator that does not.

        S(t) = prod over churn days t_i <= t of (1 - d_i / n_i)

    with d_i = churns at lifetime-day t_i and n_i = users whose
    observed lifetime >= t_i.

    Determinism: the product folds as exp(running-sum of ln terms)
    over a WINDOW ORDERED BY day — both engines evaluate running
    window sums sequentially in frame order, so the IEEE sequence is
    identical and the rounded curve replays exactly in SQL.

    Scale shape: one per-user aggregate (the only full-size shuffle),
    then day-sized relations: churn/censor counts per lifetime day,
    at-risk via one reverse-cumulative window, the KM fold via one
    ordered window. Output, one row per day with at least one churn or
    censoring: (t_day, n_risk, churned, censored, survival rounded 6).
    """
    per_user = df.groupBy(F.col(user_col).alias("u")).agg(
        F.min(F.col(ts_col).cast("timestamp")).alias("_first"),
        F.max(F.col(ts_col).cast("timestamp")).alias("_last"))
    window_end = per_user.agg(F.max("_last").alias("_end"))
    lifted = (per_user.crossJoin(F.broadcast(window_end))
              .select(
                  F.datediff(F.col("_last"), F.col("_first"))
                  .alias("t_day"),
                  (F.datediff(F.col("_end"), F.col("_last"))
                   < censor_gap_days).alias("_censored")))
    days = (lifted.groupBy("t_day")
            .agg(F.sum((~F.col("_censored")).cast("long"))
                 .alias("churned"),
                 F.sum(F.col("_censored").cast("long"))
                 .alias("censored")))
    n_total = lifted.count()
    w_prev = (Window.orderBy("t_day")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.orderBy("t_day")
             .rowsBetween(Window.unboundedPreceding, 0))
    at_risk = (days.withColumn(
        "n_risk",
        F.lit(n_total)
        - F.coalesce(F.sum(F.col("churned") + F.col("censored"))
                     .over(w_prev), F.lit(0))))
    # churned == n_risk (the whole at-risk set churns on one day, the
    # last day by construction): 1 - d/n is exactly 0 and the curve
    # must drop to 0. Spark's F.log(0) yields NULL and window sum()
    # SKIPS nulls (the curve would silently hold its prior value), so
    # emit an explicit -inf — exp(-inf) = 0.0, matching SQL engines
    # where ln(0) IS -inf.
    term = (F.when(F.col("churned") <= 0, F.lit(0.0))
            .when(F.col("churned") < F.col("n_risk"),
                  F.log(F.lit(1.0) - F.col("churned").cast("double")
                        / F.col("n_risk")))
            .otherwise(F.lit(float("-inf"))))
    return (at_risk.withColumn(
        "survival", F.round(F.exp(F.sum(term).over(w_run)), 6))
        .select("t_day", "n_risk", "churned", "censored", "survival"))

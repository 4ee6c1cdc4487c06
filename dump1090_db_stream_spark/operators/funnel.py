"""Funnel analysis: ordered-subsequence conversion matching per user.

The product-analytics staple (view -> click -> purchase): for each user,
how far through an ordered step list does their event history get, where
step i+1 must occur strictly AFTER the event that matched step i?

Spark-first shape: one groupBy(user) collects the time-ordered event
sequence, then greedy matching is a LEFT FOLD over that array —
``F.aggregate`` with the match-count as accumulator. Zero Python, zero
extra shuffles; state per user is one int. Greedy earliest-match is
optimal for subsequence matching (matching the first possible
occurrence never hurts later steps), so the fold computes exactly the
classic "t1 < t2 < ... < tk exists" semantics that the SQL min-chain
oracle replays step-by-step.

Ordering contract: events are sorted by (ts, tie_col); "strictly after"
means strictly later in that sort. With unique per-user timestamps
(this dataset) that is plain ``ts >``.

Scale: the collected sequence is one user's events — bounded by
contract (the same bound any sessionizer needs; enforce it with
``operators.sessions.cap_events_per_key`` when a key can be
unbounded). The fold runs per-row in codegen; funnel_counts
aggregates |steps| rows afterward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """(id, steps_completed): greedy funnel depth per user, 0..len(steps)."""
    n = len(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])
    seq = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("t"),
                                F.col(tie_col).alias("k"),
                                F.col(type_col).alias("e"))))
    # nested when: element_at only evaluates under acc < n (ANSI mode
    # would throw on index n+1 otherwise)
    completed = F.aggregate(
        F.col("_seq"),
        F.lit(0),
        lambda acc, ev: F.when(
            acc < n,
            F.when(ev["e"] == F.element_at(steps_lit, acc + 1), acc + 1)
             .otherwise(acc),
        ).otherwise(acc),
    )
    return (
        events.groupBy(F.col(id_col).alias("id"))
        .agg(seq.alias("_seq"))
        .select("id", completed.alias("steps_completed"))
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """(step, step_name, n_users): users reaching AT LEAST each step.

    Monotone by construction (reaching step i implies reaching i-1).
    The cumulative window runs over |steps| aggregated rows, not events.
    """
    depths = funnel_steps(events, steps, id_col=id_col, ts_col=ts_col,
                          type_col=type_col, tie_col=tie_col)
    per_depth = depths.groupBy("steps_completed").agg(
        F.count(F.lit(1)).alias("n_at"))
    steps_df = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], ["step", "step_name"])
    # anchor every step depth with a zero row BEFORE the cumulative sum:
    # a depth no user stops at exactly must still count everyone who
    # went deeper (equi-joining steps to observed depths would miss them)
    anchors = steps_df.select(
        F.col("step").alias("steps_completed"),
        F.lit(0).cast("long").alias("n_at"))
    filled = (per_depth.unionByName(anchors)
              .groupBy("steps_completed").agg(F.sum("n_at").alias("n_at")))
    # n_users(step s) = sum of n_at over depths >= s; the window runs
    # over at most |steps|+1 aggregated rows
    w = (Window.orderBy(F.col("steps_completed").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    reached = filled.select(
        "steps_completed", F.sum("n_at").over(w).alias("n_users"))
    return (
        F.broadcast(steps_df)
        .join(reached, steps_df.step == reached.steps_completed)
        .select("step", "step_name", "n_users")
    )

"""Dataset-version diffing: what changed between two corpus snapshots.

Training-data pipelines re-crawl and re-filter; before retraining you
need to know what actually changed. ``corpus_diff`` classifies every id
across two snapshots as added / removed / changed / unchanged by
comparing content digests — a full-outer join on id with md5 compare,
so the shuffle carries (id, 32-byte digest), never document bodies
(same discipline as exact_dedup).

At 100 TB both sides prune to two columns at the scan, and the join is
a plain shuffled hash join on the id — or shuffle-FREE when both
snapshots are stored bucketed by id (sinks.writers.write_bucketed_table),
which is exactly how successive corpus versions should be laid out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.text import content_hash


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-id change classification between two snapshots.

    Output: (id, status, old_md5, new_md5) with status in
    {'added', 'removed', 'changed', 'unchanged'}.
    """
    o = old.select(F.col(id_col).alias("id"),
                   content_hash(F.col(text_col)).alias("old_md5"))
    n = new.select(F.col(id_col).alias("id"),
                   content_hash(F.col(text_col)).alias("new_md5"))
    j = o.join(n, "id", "full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") == F.col("new_md5"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("id").alias(id_col), status.alias("status"),
                    "old_md5", "new_md5")


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Counts per change status — the dataset-version audit line."""
    return (corpus_diff(old, new, id_col, text_col)
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n")))

"""Connected components over candidate-pair graphs (dedup clustering).

Near-dup operators (ngram_jaccard_pairs, minhash_lsh_pairs,
embedding_neardup_pairs) emit PAIRS; an actual dedup pass needs the
transitive closure — clusters — and one canonical survivor per cluster.
This module turns a pair list into (id, component) with
min-label propagation, the DataFrame re-expression of the
MapReduce-style alternating algorithm (cf. Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).

Scale shape per iteration: one equi-join of the label relation onto
the (symmetrized) edge list + one min-aggregation — both map-side
combinable, shuffles keyed on node id. Iteration count is bounded by
the longest label-propagation chain (graph diameter, <= log n rounds
for star-collapsing variants; plain min-propagation used here is
diameter-bounded, which for dedup graphs — dense small clusters — is
tiny). Convergence is detected with a per-iteration changed-label
count: a driver-side ACTION per round, the standard and unavoidable
pattern for iterative DataFrame algorithms (each round's WORK is fully
distributed; only the 1-row convergence flag reaches the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dump1090_db_stream_spark.cache import track


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = the
    minimum node id reachable from the node. Deterministic.

    Isolated nodes don't appear in a pair list, so they don't appear
    here — union the full corpus with component = own id afterwards
    (see :func:`canonical_map`).
    """
    sym = edges.select(F.col(src_col).alias("a"),
                       F.col(dst_col).alias("b")).union(
        edges.select(F.col(dst_col).alias("a"),
                     F.col(src_col).alias("b"))).distinct()
    sym = track(sym)
    # Lineage discipline: each round references the previous labels
    # relation TWICE (directly and through the neighbor aggregate), so
    # the logical plan would DOUBLE per iteration — exponential
    # analysis cost/OOM by ~30 rounds even on tiny data. localCheckpoint
    # truncates lineage every round; at cluster scale swap in a
    # reliable checkpoint dir for fault tolerance.
    labels = (sym.select(F.col("a").alias("id"))
              .distinct()
              .withColumn("comp", F.col("id"))
              .localCheckpoint(eager=True))
    for _ in range(max_iterations):
        # neighbor's current component, min'd per node
        nbr = (sym.join(labels.withColumnRenamed("id", "a"), "a")
               .groupBy(F.col("b").alias("id"))
               .agg(F.min("comp").alias("nbr_comp")))
        new_labels = (labels.join(nbr, "id", "left")
                      .select("id", F.least(
                          F.col("comp"),
                          F.coalesce(F.col("nbr_comp"), F.col("comp"))
                      ).alias("comp"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.comp") != F.col("o.comp"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_map(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """(id, canonical_id) over the WHOLE corpus: cluster members map to
    their component's minimum id, singletons map to themselves. The
    dedup decision is then ``keep iff id == canonical_id``."""
    comp = connected_components(pairs, src_col, dst_col)
    return (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("comp"), F.col(id_col)).alias("canonical_id"),
        )
    )

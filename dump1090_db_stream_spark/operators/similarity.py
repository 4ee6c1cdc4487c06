"""Similarity search over embedding columns (array<float>).

Two paths, as a training-data pipeline needs both:

- brute_force_topk : exact cosine top-k — the correctness baseline and
  the right choice when the query set is small (broadcast queries,
  single scan of the corpus, per-partition top-k then global top-k).
- lsh_topk         : random-hyperplane LSH bucketing — the scale path;
  only vectors sharing a bucket are compared, trading recall for a
  shuffle bounded by O(rows x tables) instead of O(rows x queries).

All dot products run as native higher-order functions (zip_with +
aggregate) in doubles — JVM-side, no Python. For very wide vectors
(>1k dims) a Pandas-UDF matmul over mapInPandas batches becomes faster;
that variant lives in operators.multimodal (vectorized feature path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, window-rank per query, keep k.

    Plan shape at scale: one scan of the corpus, broadcast nested-loop
    against Q queries (Q small by contract), partial top-k per partition
    via the rank window. The shuffle carries only (query, candidate,
    score) rows — k x Q after ranking.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
    )
    scored = (
        c.join(F.broadcast(q),
               F.col("neighbor_id") != F.col("query_id"))  # exclude self
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cosine", 6).alias("cosine"))
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from a seeded LCG —
    no numpy at plan build time, reproducible across runs/engines."""
    out, state = [], (seed * 6364136223846793005 + 1442695040888963407) % (1 << 63)
    for _ in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(((state >> 33) / float(1 << 30)) - 1.0)  # [-1, 1)
    return out


def rh_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 7) -> Column:
    """Random-hyperplane signature: n_planes sign bits packed in a bigint."""
    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, seed * 1000 + p)])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = sig.bitwiseOR(bit.cast("bigint"))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: compare only vectors whose random-hyperplane
    signature matches the query's in at least one of n_tables tables.

    Scale: corpus is scanned once to compute signatures (narrow), the
    join is an equi-join on (table, signature) — shuffle O(rows x tables)
    — and exact cosine runs only on bucket collisions. Recall grows with
    n_tables, cost with n_planes^-1; the (12, 4) default targets ~0.9
    recall at ~1% of brute-force comparisons for random 64-dim data.
    """
    def with_sigs(df: DataFrame, id_alias: str) -> DataFrame:
        return df.select(
            F.col(id_alias).alias(id_alias),
            F.col(vec_col).alias(f"{id_alias}_vec"),
            F.explode(F.array(*[
                F.struct(
                    F.lit(t).alias("tbl"),
                    rh_signature(F.col(vec_col), dim, n_planes, seed=7 + t).alias("sig"),
                ) for t in range(n_tables)
            ])).alias("s"),
        ).select(id_alias, f"{id_alias}_vec", "s.tbl", "s.sig")

    c = with_sigs(corpus.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
    q = with_sigs(queries.withColumnRenamed(query_id_col, "query_id"), "query_id")
    cand = (
        c.join(F.broadcast(q), (c.tbl == q.tbl) & (c.sig == q.sig)
               & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "neighbor_id", "query_id_vec", "neighbor_id_vec")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("cosine", cosine(F.col("query_id_vec"),
                                         F.col("neighbor_id_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cosine", 6).alias("cosine"))
    )


def exact_cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold. O(n^2) by definition — this is
    the CORRECTNESS BASELINE / validator for embedding_neardup_pairs (the
    LSH scale path), exactly as brute_force_topk anchors lsh_topk. Run it
    on samples or per-bucket slices at scale, never the full corpus.

    Norms are computed once per row before the join (narrow), so the
    pairwise stage is a single multiply-accumulate per pair."""
    n = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.round(dot(F.col("a.vec"), F.col("b.vec"))
                    / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# --- IVF (inverted-file) ANN: k-means coarse quantizer + cluster probing ---


def kmeans_centroids(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd k-means (cosine assignment, mean update) for the
    IVF coarse quantizer. Returns centroids as a plain driver-side list —
    they are metadata-scale (k x dim doubles, KBs), the same contract as
    Spark MLlib's KMeans which also collects cluster sums per iteration.

    Scale shape per iteration (designed for 100 TB):
    - init: md5-ranked sample via orderBy(hash).limit(k) — Spark plans
      TakeOrderedAndProject (per-partition top-k), never a global sort;
    - assignment is a NARROW map: the k dot products are inlined as native
      column expressions over literal centroid arrays — no cross join, no
      shuffle, no Python;
    - update: groupBy(cluster).agg(count, per-dimension sums) — map-side
      partial aggregation collapses each partition to <= k rows before a
      shuffle of O(k x dim) doubles. Driver receives k rows per iteration.
    """
    init = (
        df.orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_centroids)
        .select(F.col(vec_col).alias("v"))
        .collect()
    )
    centroids = [[float(x) for x in r["v"]] for r in init]
    vec = F.col(vec_col)
    for _ in range(n_iters):
        cluster = _nearest_centroid(vec, centroids)
        sums = (
            df.select(cluster.alias("cluster"), vec.alias("v"))
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"),
                 *[F.sum(F.col("v")[i].cast("double")).alias(f"s{i}")
                   for i in range(dim)])
            .collect()
        )
        for row in sums:
            centroids[row["cluster"]] = [row[f"s{i}"] / row["n"]
                                         for i in range(dim)]
    return centroids


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the max-cosine centroid as a narrow native expression:
    array of (sim, -idx) structs -> array_max (struct ordering) -> idx.
    Negated index makes ties break toward the LOWER cluster id."""
    scored = F.array(*[
        F.struct(
            (dot(vec, F.array(*[F.lit(x) for x in c]))
             / F.lit(sum(x * x for x in c) ** 0.5 or 1.0)).alias("sim"),
            F.lit(-i).alias("neg_idx"),
        )
        for i, c in enumerate(centroids)
    ])
    return (-F.array_max(scored)["neg_idx"]).cast("int")


def _probe_clusters(vec: Column, centroids: list[list[float]],
                    n_probes: int) -> Column:
    """Array of the n_probes nearest cluster ids, best first."""
    scored = F.array(*[
        F.struct(
            (-dot(vec, F.array(*[F.lit(x) for x in c]))
             / F.lit(sum(x * x for x in c) ** 0.5 or 1.0)).alias("neg_sim"),
            F.lit(i).alias("idx"),
        )
        for i, c in enumerate(centroids)
    ])
    return F.slice(
        F.transform(F.array_sort(scored), lambda s: s["idx"]), 1, n_probes)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probes: int = 4,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus by a k-means
    coarse quantizer, probe only the n_probes clusters nearest each query.

    The FAISS-IVF shape re-expressed in DataFrame ops:
    - train: kmeans_centroids (above; pass ``centroids`` to reuse an index
      across query batches — the IVF analog of a persisted index);
    - corpus assignment: narrow expression (no shuffle) — at scale,
      write-once as a `cluster`-partitioned table so probing becomes
      partition pruning;
    - search: explode each query to its probe list, EQUI-join corpus on
      cluster (broadcast the small query side), exact cosine only within
      probed clusters, window top-k per query.
    Compared against brute force: touches n_probes/n_centroids of the
    corpus per query; recall depends on quantizer quality (tested in
    tests/test_similarity.py against brute_force_topk).
    """
    if centroids is None:
        centroids = kmeans_centroids(
            corpus, dim, n_centroids, n_iters, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _nearest_centroid(F.col(vec_col), centroids).alias("cluster"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(
            _probe_clusters(F.col(vec_col), centroids, n_probes)
        ).alias("cluster"),
    )
    scored = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cosine", 6).alias("cosine"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold) via the
    same hyperplane bucketing: high-cosine pairs agree on most sign bits,
    so multi-table exact-signature collision catches them with high
    probability while keeping the self-join keyed (never a cross join)."""
    sigs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     rh_signature(F.col(vec_col), dim, n_planes, seed=101 + t).alias("sig"))
            for t in range(n_tables)
        ])).alias("s"),
    ).select("id", "vec", "s.tbl", "s.sig")
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, (F.col("a.tbl") == F.col("b.tbl"))
               & (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.vec").alias("vec_a"), F.col("b.vec").alias("vec_b"))
        .distinct()
        .withColumn("cosine", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )

"""Sequence packing & context-window chunking for pretraining pipelines.

Two shapes every LLM data pipeline needs between "clean corpus" and
"training batches":

- chunk_documents  long document -> overlapping fixed-token windows
                   (the context-window split for embedding/pretraining).
                   Pure Column expressions: sequence -> slice -> join;
                   one explode, zero Python, zero shuffle.
- pack_sequences   short documents -> ~token_budget bins ("sequence
                   packing" — filling each training sequence instead of
                   padding). Exact greedy packing is inherently
                   sequential, so the scalable form used here is
                   bucketed greedy: documents are hash-assigned to
                   n_buckets independent streams, each stream packs
                   sequentially by running token sum (one window
                   cumsum = one shuffle), and a bin is
                   (bucket, floor(prev_cumsum / budget)). Bins can
                   overflow by at most one document — the standard
                   streaming-packing trade. Deterministic: hash order,
                   never rand()/scan order, so the same corpus packs
                   identically on any cluster layout (oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.sampling import portable_hash
from dump1090_db_stream_spark.operators.text import tokens


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` with ``overlap`` tokens shared between neighbors.

    Output: (id, chunk_index, n_chunk_tokens, chunk_text), one row per
    chunk; a doc shorter than one window yields exactly one chunk.
    Chunk starts step by ``chunk_tokens - overlap``; a start is emitted
    only while the PREVIOUS window did not already reach the document's
    end (start + overlap < n_tokens), so no chunk consists purely of
    tokens its predecessor covered; every chunk except the last is
    exactly ``chunk_tokens`` long (property-tested).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toked = df.select(
        F.col(id_col).alias("id"),
        tokens(text_col).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    # starts 0, step, 2*step, ... while start + overlap < n
    # (>=1 chunk per doc; no all-overlap trailing chunk)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("_n") - overlap - 1, F.lit(0)),
        F.lit(step))
    out = toked.select(
        "id", "_toks", "_n",
        F.posexplode(starts).alias("chunk_index", "_start"),
    ).select(
        F.col("id").alias(id_col),
        "chunk_index",
        F.least(F.col("_n") - F.col("_start"), F.lit(chunk_tokens))
            .alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("_toks"), F.col("_start") + 1,
                         F.lit(chunk_tokens))).alias("chunk_text"),
    )
    return out


def chunk_documents_sql(
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    table: str = "documents",
) -> str:
    """ANSI/DuckDB twin of :func:`chunk_documents` (oracle builder)."""
    step = chunk_tokens - overlap
    return f"""
        WITH toked AS (
            SELECT {id_expr} AS id,
                   regexp_split_to_array(trim({text_expr}), '\\s+') AS t
            FROM {table}
        ), starts AS (
            SELECT id, t, len(t) AS n,
                   unnest(range(0, greatest(len(t) - {overlap}, 1),
                                {step})) AS start
            FROM toked
        )
        SELECT id AS {id_expr},
               CAST(start // {step} AS INT) AS chunk_index,
               CAST(least(n - start, {chunk_tokens}) AS INT)
                   AS n_chunk_tokens,
               array_to_string(list_slice(t, start + 1,
                                          start + {chunk_tokens}), ' ')
                   AS chunk_text
        FROM starts
    """


def pack_sequences(
    df: DataFrame,
    token_budget: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign documents to training-sequence bins of ~``token_budget``
    tokens (bucketed greedy running-sum packing).

    Output: (id, n_tokens, bucket, bin, offset) where ``offset`` is the
    document's token start inside its (bucket, bin) sequence stream.
    A document whose prev-cumsum lands in bin k starts at
    ``offset = prev_cumsum - k * token_budget`` and may overflow into
    k+1 (streaming packing's one-doc overflow trade); callers that need
    hard caps split the overflow doc with :func:`chunk_documents` first.

    One shuffle (the per-bucket window). n_buckets bounds per-task state:
    each bucket's cumsum is a sequential scan of ~corpus/n_buckets docs;
    at cluster scale set n_buckets ~ O(cores) so streams stay parallel
    while bins stay dense.
    """
    w = (Window.partitionBy("bucket")
         .orderBy(F.col("_h").asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (
        df.select(
            F.col(id_col),
            F.col(n_tokens_col).cast("long").alias("n_tokens"),
            portable_hash(id_col).alias("_h"),
        )
        .withColumn("bucket",
                    F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int"))
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            id_col, "n_tokens", "bucket",
            F.floor((F.col("_cum") - F.col("n_tokens"))
                    / F.lit(token_budget)).cast("long").alias("bin"),
            F.pmod(F.col("_cum") - F.col("n_tokens"),
                   F.lit(token_budget)).alias("offset"),
        )
    )
    return out


def pack_sequences_sql(
    token_budget: int = 2048,
    n_buckets: int = 64,
    id_expr: str = "doc_id",
    n_tokens_expr: str = "n_tokens",
    table: str = "documents",
) -> str:
    """ANSI/DuckDB twin of :func:`pack_sequences` (oracle builder)."""
    from dump1090_db_stream_spark.operators.sampling import portable_hash_sql

    h = portable_hash_sql(id_expr)
    return f"""
        WITH based AS (
            SELECT {id_expr} AS id,
                   CAST({n_tokens_expr} AS BIGINT) AS n_tokens,
                   ({h}) AS h
            FROM {table}
        ), cum AS (
            SELECT id, n_tokens, CAST(h % {n_buckets} AS INT) AS bucket,
                   sum(n_tokens) OVER (
                       PARTITION BY h % {n_buckets}
                       ORDER BY h, id
                       ROWS UNBOUNDED PRECEDING) AS c
            FROM based
        )
        SELECT id AS {id_expr}, n_tokens, bucket,
               CAST(floor((c - n_tokens) / {token_budget}) AS BIGINT)
                   AS bin,
               CAST((c - n_tokens) % {token_budget} AS BIGINT) AS offset
        FROM cum
    """


def length_grouped_batches(
    df: DataFrame,
    batch_size: int,
    bucket_width: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Length-grouped batch assignment (the dynamic-batching recipe:
    group sequences of similar token length so per-batch padding waste
    stays low, but shuffle WITHIN each length bucket so batches aren't
    sorted by length — the seeded portable hash provides the
    deterministic shuffle). Returns BATCH-level stats, the padding
    audit a pipeline gates on:

        (bucket, batch_index, n_docs, max_tokens, sum_tokens, pad_frac)

    pad_frac = 1 - sum/(max*n) — the fraction of a padded batch tensor
    that is padding. One window (rank within bucket) + one aggregate;
    the rank key is (seeded hash, id), so the assignment is exact
    under rerun/repartition and closed-form replayable in SQL.
    """
    from dump1090_db_stream_spark.operators.sampling import (
        portable_hash_seeded,
    )
    from dump1090_db_stream_spark.operators.text import token_count

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    base = df.select(
        F.col(id_col).alias("id"),
        token_count(F.col(text_col)).alias("n_tok"))
    bucket = F.floor(F.col("n_tok") / bucket_width).cast("long")
    h = portable_hash_seeded("id", seed)
    w = Window.partitionBy("bucket").orderBy("h", "id")
    assigned = (base.select("id", "n_tok", bucket.alias("bucket"),
                            h.alias("h"))
                .withColumn("rn", F.row_number().over(w))
                .withColumn("batch_index",
                            F.floor((F.col("rn") - 1) / batch_size)
                            .cast("long")))
    return (assigned.groupBy("bucket", "batch_index")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.max("n_tok").alias("max_tokens"),
                 F.sum(F.col("n_tok").cast("long")).alias("sum_tokens"))
            .select("bucket", "batch_index", "n_docs", "max_tokens",
                    "sum_tokens",
                    F.round(F.lit(1.0)
                            - F.col("sum_tokens")
                            / (F.col("max_tokens").cast("double")
                               * F.col("n_docs")), 6).alias("pad_frac")))


def packing_efficiency(
    packed: DataFrame,
    token_budget: int = 2048,
) -> DataFrame:
    """Utilization audit of a :func:`pack_sequences` layout — the
    number a training-data engineer actually reviews before a run:
    how full are the sequence bins, and how many documents overflow
    their bin boundary (the streaming packer's one-doc overflow
    trade). One row per bucket: ``(bucket, n_docs, n_bins, n_tokens,
    capacity, fill_ratio, n_overflow)`` where ``capacity =
    n_bins * token_budget`` and ``fill_ratio = n_tokens / capacity``
    (rounded 6; exact-integer division inputs, oracle-identical).

    One bounded aggregation over the packed relation (bucket count is
    a parameter, never data-sized). ``token_budget`` must match the
    packing call — it is a parameter rather than re-derived because
    the packed relation does not carry it.
    """
    n_bins = (F.max("bin") + 1).cast("long")
    cap = (n_bins * F.lit(token_budget)).cast("long")
    over = F.sum(
        F.when(F.col("offset") + F.col("n_tokens")
               > F.lit(token_budget), 1).otherwise(0)).cast("long")
    return (packed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 n_bins.alias("n_bins"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 cap.alias("capacity"),
                 F.round(F.sum("n_tokens").cast("double")
                         / (n_bins * F.lit(token_budget))
                         .cast("double"), 6).alias("fill_ratio"),
                 over.alias("n_overflow")))

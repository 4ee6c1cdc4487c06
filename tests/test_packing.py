"""Sequence packing / chunking operators (operators.packing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)


def test_chunk_documents_known_layout(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_index"])
    # starts 0,3,6 -> 3 chunks; start 9 is suppressed (its only token,
    # t9, is already covered by the window starting at 6)
    assert [r["chunk_index"] for r in rows] == [0, 1, 2]
    assert [r["chunk_text"] for r in rows] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert [r["n_chunk_tokens"] for r in rows] == [4, 4, 4]


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "only three tokens")],
                               ["doc_id", "text"])
    rows = chunk_documents(df, chunk_tokens=128, overlap=16).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "only three tokens"
    assert rows[0]["n_chunk_tokens"] == 3


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_documents_covers_all_tokens(spark):
    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), (F.col("id") * 7) % 50 + 1),
            lambda i: F.concat(F.lit("w"), i))).alias("text"))
    chunks = chunk_documents(docs, chunk_tokens=8, overlap=2)
    # stitching chunks back (dropping each chunk's first `overlap` tokens
    # after chunk 0) reproduces the original token stream
    stitched = (
        chunks.select(
            "doc_id", "chunk_index",
            F.split("chunk_text", " ").alias("ct"))
        .select(
            "doc_id", "chunk_index",
            F.when(F.col("chunk_index") == 0, F.col("ct"))
             .otherwise(F.slice(F.col("ct"), 3, 100000)).alias("part"))
        .groupBy("doc_id")
        .agg(F.flatten(F.sort_array(F.collect_list(
            F.struct("chunk_index", "part")))["part"]).alias("toks")))
    orig = docs.select("doc_id", F.split("text", " ").alias("toks"))
    joined = stitched.alias("a").join(orig.alias("b"), "doc_id").select(
        (F.col("a.toks") == F.col("b.toks")).alias("same"))
    assert all(r["same"] for r in joined.collect())


def test_pack_sequences_invariants(spark):
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 400 + 10).alias("n_tokens"))
    packed = pack_sequences(docs, token_budget=1000, n_buckets=8)
    rows = packed.collect()
    assert len(rows) == 500                      # every doc placed
    assert all(0 <= r["offset"] < 1000 for r in rows)
    assert all(0 <= r["bucket"] < 8 for r in rows)
    # per (bucket, bin): total load fills the budget except the last bin
    # of each bucket (streaming packing: a bin closes only by overflow)
    from collections import defaultdict
    load = defaultdict(int)
    for r in rows:
        load[(r["bucket"], r["bin"])] += r["n_tokens"]
    for (bkt, b), tot in load.items():
        last_bin = max(bb for (k, bb) in load if k == bkt)
        if b < last_bin:
            assert tot >= 1000 - 409  # >= budget - max_doc: bin was full

    # deterministic under repartition
    again = pack_sequences(docs.repartition(13), token_budget=1000,
                           n_buckets=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pack_sequences_single_window_shuffle(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit(50).alias("n_tokens"))
    plan = (pack_sequences(docs, token_budget=500, n_buckets=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1  # exactly the window repartition


def test_length_grouped_batches_contract(spark):
    import pytest

    from dump1090_db_stream_spark.operators.packing import (
        length_grouped_batches,
    )

    # 40 docs of 3 tokens, 20 of 20 tokens -> buckets 0 and 1
    docs = [(i, "a b c" if i < 40 else " ".join(["w"] * 20), )
            for i in range(60)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = length_grouped_batches(df, batch_size=16, bucket_width=16,
                                 seed=3).collect()
    by = {(r["bucket"], r["batch_index"]): r for r in out}
    # bucket 0: 40 docs -> batches of 16, 16, 8; bucket 1: 20 -> 16, 4
    assert sorted((b, i, by[(b, i)]["n_docs"]) for b, i in by) == [
        (0, 0, 16), (0, 1, 16), (0, 2, 8), (1, 0, 16), (1, 1, 4)]
    for (b, i), r in by.items():
        # same-length docs per bucket here -> zero padding waste
        assert r["pad_frac"] == 0.0
        assert r["sum_tokens"] == r["n_docs"] * r["max_tokens"]
    # deterministic under rerun + repartition
    again = sorted(map(tuple, length_grouped_batches(
        df.repartition(5), batch_size=16, bucket_width=16,
        seed=3).collect()))
    assert sorted(map(tuple, out)) == again
    with pytest.raises(ValueError, match="batch_size"):
        length_grouped_batches(df, batch_size=0)


def test_packing_efficiency_matches_hand_layout(spark):
    """Audit over a hand-checkable layout: budget 10, one bucket via
    n_buckets=1. Docs hash-ordered; verify bins/capacity/fill/overflow
    against the independently summed layout."""
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.packing import (
        pack_sequences,
        packing_efficiency,
    )

    docs = spark.createDataFrame(
        [(i, 4 + (i % 5)) for i in range(20)], ["doc_id", "n_toks"])
    packed = pack_sequences(docs, token_budget=10, n_buckets=1,
                            id_col="doc_id", n_tokens_col="n_toks")
    [r] = packing_efficiency(packed, token_budget=10).collect()
    rows = packed.collect()
    total = sum(x["n_tokens"] for x in rows)
    n_bins = max(x["bin"] for x in rows) + 1
    n_over = sum(1 for x in rows if x["offset"] + x["n_tokens"] > 10)
    assert r["n_docs"] == 20
    assert r["n_tokens"] == total
    assert r["n_bins"] == n_bins
    assert r["capacity"] == n_bins * 10
    assert r["fill_ratio"] == round(total / (n_bins * 10), 6)
    assert r["n_overflow"] == n_over
    # docs are 4-8 tokens vs budget 10: overflow MUST occur somewhere
    assert n_over > 0

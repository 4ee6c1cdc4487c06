"""r15 capstone featurization fusion: the fused one-pass front end of
``_capstone_stages`` (gopher + exact-dup digest + decontamination flag
+ shingle index in ONE projection over documents.text) must compute
exactly what the r14 composition of standalone operators computed.

Three pins:

1. the ``gopher_rules`` ``keep`` passthrough leaves the default output
   bit-identical and appends kept columns unchanged;
2. the ``ngram_jaccard_pairs`` ``shingle_index`` seam yields the same
   pair multiset as the inline tokenize path;
3. end-to-end: ``q_pipeline_capstone`` on a synthetic corpus with the
   hostile cases the sf fixtures lack (NULL text, empty text,
   whitespace-only text, exact duplicates, near duplicates,
   benchmark-contaminated prefixes) equals a reference recomposition
   that uses the r14 operator-by-operator front end (standalone
   gopher_rules + cross_ngram_overlap + digest aggregate + per-flag
   joins).
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.dedup import (
    cross_ngram_overlap,
    ngram_jaccard_pairs,
    _hash64,
)
from dump1090_db_stream_spark.operators.text import (
    gopher_rules,
    shingles,
    with_tokens,
)

WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango "
         "uniform victor whiskey xray yankee zulu the").split()


def _text(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n_words))


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """Synthetic documents table with every hostile case in one place."""
    rng = random.Random(7)
    rows = []

    def add(doc_id, text, source="web"):
        rows.append((doc_id, text, "en",
                     source, len(text) if text is not None else 0))

    # refs are doc_ids 3/47/90 by the capstone contract; give them
    # enough words that their 12-word prefix carries >= 3 bigrams
    for rid in (3, 47, 90):
        add(rid, _text(rng, 60), source="bench")
    # long clean docs (gopher passers), three sources
    for i in range(20):
        add(100 + i, _text(rng, 50 + i), source=("web", "news", "wiki")[i % 3])
    # short docs (gopher word-count failures)
    for i in range(5):
        add(200 + i, _text(rng, 10))
    # exact duplicates (same text, three ids -> one survivor)
    dup = _text(rng, 55)
    for i in range(3):
        add(300 + i, dup)
    # near duplicates: shared 45-word body, one word appended
    body = _text(rng, 45)
    for i in range(3):
        add(400 + i, body + f" tail{i}")
    # contaminated: embed ref 3's 12-word prefix inside a long doc
    ref3_prefix = " ".join(rows[0][1].split()[:12])
    add(500, ref3_prefix + " " + _text(rng, 45))
    # degenerate texts
    add(600, None)
    add(601, "")
    add(602, "   ")
    out = str(tmp_path_factory.mktemp("capstone_corpus"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet"))
    return out


def test_gopher_keep_default_is_bit_identical(spark, corpus_dir):
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    base = gopher_rules(docs, min_words=40, min_stop_hits=1)
    kept = gopher_rules(docs, min_words=40, min_stop_hits=1,
                        keep=("source", "n_chars"))
    assert kept.columns == base.columns + ["source", "n_chars"]
    a = sorted(map(tuple, base.collect()))
    b = sorted(t[:len(base.columns)] for t in map(tuple, kept.collect()))
    assert a == b
    # kept columns pass through unchanged
    src = {r["doc_id"]: (r["source"], r["n_chars"]) for r in kept.collect()}
    ref = {r["doc_id"]: (r["source"], r["n_chars"]) for r in docs.collect()}
    assert src == ref


def test_shingle_index_seam_matches_inline(spark, corpus_dir):
    docs = spark.read.parquet(os.path.join(corpus_dir, "documents.parquet"))
    inline = ngram_jaccard_pairs(docs, n=3, threshold=0.03)
    idx = (with_tokens(docs)
           .select(F.col("doc_id").alias("id"),
                   F.explode(F.array_distinct(
                       shingles(F.col("_toks"), 3))).alias("s"))
           .select("id", _hash64(F.col("s"), 0).alias("sh")))
    seamed = ngram_jaccard_pairs(docs, n=3, threshold=0.03,
                                 shingle_index=idx)
    assert sorted(map(tuple, inline.collect())) == \
        sorted(map(tuple, seamed.collect()))


def _reference_capstone(spark, sf_dir):
    """The r14 front end: standalone operators + per-flag joins, then
    the same split/mix/pack/aggregate tail as q_pipeline_capstone."""
    from pyspark.sql import Window

    from dump1090_db_stream_spark.operators.graph import canonical_map
    from dump1090_db_stream_spark.operators.packing import pack_sequences
    from dump1090_db_stream_spark.operators.sampling import (
        hash_split,
        temperature_sample,
    )
    from dump1090_db_stream_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    gop = gopher_rules(docs, min_words=40, min_stop_hits=1).select(
        "doc_id", "gopher_pass")
    canon = canonical_map(
        docs, ngram_jaccard_pairs(docs, n=3, threshold=0.03))
    refs = (docs.filter(F.col("doc_id").isin(3, 47, 90))
            .select(F.col("doc_id").alias("ref_id"),
                    F.concat_ws(" ", F.slice(
                        F.split(F.trim(F.col("text")), r"\s+"),
                        1, 12)).alias("text")))
    contam = (cross_ngram_overlap(docs, refs, n=2, min_common=3)
              .select("doc_id").distinct())
    _dig = F.coalesce(F.md5("text"), F.lit("\0NULL"))
    exact_min = (docs.select(_dig.alias("_h"), "doc_id")
                 .groupBy("_h").agg(F.min("doc_id").alias("_exact_min")))
    flt = (docs.select("doc_id", _dig.alias("_h"), "source", "n_chars")
           .join(exact_min, "_h")
           .join(gop, "doc_id")
           .join(canon, "doc_id")
           .filter(F.col("gopher_pass")
                   & (F.col("doc_id") == F.col("_exact_min")))
           .join(contam, "doc_id", "left_anti"))
    w_clust = Window.partitionBy("canonical_id")
    surv = (flt.select("doc_id", "canonical_id", "source", "n_chars")
            .withColumn("_cmin", F.min("doc_id").over(w_clust))
            .filter(F.col("doc_id") == F.col("_cmin"))
            .select("doc_id", "canonical_id", "source", "n_chars"))
    split = hash_split(surv, "canonical_id")
    train = split.filter(F.col("split") == "train")
    mixed = temperature_sample(train, alpha=0.5, seed=0).select(
        "doc_id", "canonical_id", "source", "n_chars", "split")
    packed = pack_sequences(mixed, token_budget=2048, n_buckets=16,
                            n_tokens_col="n_chars").select(
        "doc_id", "bucket", "bin")
    pool = (split.filter(F.col("split") != "train")
            .select("doc_id", "source", "n_chars", "split",
                    F.lit(None).cast("int").alias("bucket"),
                    F.lit(None).cast("long").alias("bin"))
            .unionByName(mixed.join(packed, "doc_id")
                         .select("doc_id", "source", "n_chars", "split",
                                 "bucket", "bin")))
    seq_key = F.when(
        F.col("split") == "train",
        F.concat_ws(":", F.col("bucket").cast("string"),
                    F.col("bin").cast("string")))
    return (pool.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("n_chars_total"),
                 F.countDistinct("source").alias("n_sources"),
                 F.countDistinct(seq_key).alias("n_sequences"))
            .select("split", "n_docs", "n_chars_total", "n_sources",
                    "n_sequences"))


def test_fused_capstone_equals_r14_composition(spark, corpus_dir):
    import __spark_entry__ as entrymod

    got = sorted(map(tuple, entrymod.q_pipeline_capstone(
        spark, corpus_dir).collect()))
    ref = sorted(map(tuple, _reference_capstone(
        spark, corpus_dir).collect()))
    assert got == ref
    # sanity: the corpus exercises every branch — something survives,
    # something is filtered (exact dups collapse, shorts fail gopher,
    # doc 500 is decontaminated away)
    n_docs = sum(r[1] for r in got)
    assert 0 < n_docs < 34


def test_fused_capstone_drops_contaminated_doc(spark, corpus_dir):
    """Doc 500 shares >= 3 bigrams with ref 3's 12-word prefix and is
    long/clean enough to pass every other gate: its absence from every
    split pins the fused per-row intersect flag against the exploded
    cross_ngram_overlap semantics."""
    import __spark_entry__ as entrymod
    from dump1090_db_stream_spark.sources.tables import load_table

    docs = load_table(spark, corpus_dir, "documents")
    refs = (docs.filter(F.col("doc_id").isin(3, 47, 90))
            .select(F.col("doc_id").alias("ref_id"),
                    F.concat_ws(" ", F.slice(
                        F.split(F.trim(F.col("text")), r"\s+"),
                        1, 12)).alias("text")))
    hits = {r["doc_id"] for r in cross_ngram_overlap(
        docs, refs, n=2, min_common=3).select("doc_id").collect()}
    assert 500 in hits  # fixture actually contaminates doc 500
    split, mixed, packed = entrymod._capstone_stages(spark, corpus_dir)
    survivors = {r["doc_id"] for r in split.select("doc_id").collect()}
    assert 500 not in survivors
    assert not (hits & survivors)

"""Distributed BPE trainer (operators.bpe) vs a pure-Python
Sennrich-style reference implementation.

The reference below is the textbook algorithm (learn_bpe from
"Neural Machine Translation of Rare Words with Subword Units",
Sennrich et al. 2016): overlap-counting pair statistics over the
word-type table, highest-count-then-lexicographic argmax, greedy
left-to-right non-overlapping merge application.
"""

from __future__ import annotations

import collections
import re

import pytest
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators import bpe


# ---------------------------------------------------------------- reference

def ref_word_freqs(texts):
    wf = collections.Counter()
    for t in texts:
        if t is not None:
            wf.update(re.findall(r"[^\W_]+", t, re.UNICODE))
    return wf


def ref_pair_counts(words):
    c = collections.Counter()
    for w, (f, s) in words.items():
        for i in range(len(s) - 1):
            c[(s[i], s[i + 1])] += f
    return c


def ref_merge(syms, l, r):
    out = []
    for s in syms:
        if out and out[-1] == l and s == r:
            out[-1] = l + r
        else:
            out.append(s)
    return out


def ref_train(texts, n_merges):
    words = {w: (f, list(w)) for w, f in ref_word_freqs(texts).items()}
    merges = []
    for k in range(n_merges):
        pc = ref_pair_counts(words)
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append({"merge_rank": k, "lhs": l, "rhs": r,
                       "merged": l + r, "pair_count": cnt})
        words = {w: (f, ref_merge(s, l, r)) for w, (f, s) in words.items()}
    return merges, words


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], ["text"])


# ------------------------------------------------------------------- tests

def test_merge_fold_overlapping_run_is_greedy(spark):
    """'aaaa' under merge (a,a) -> [aa, aa], never [aa, a, a] or
    [a, aa, a]: the fold's just-merged token cannot re-merge."""
    df = _docs(spark, ["x"]).select(
        bpe.merge_fold(F.split(F.lit("aaaa"), ""), "a", "a").alias("m"),
        bpe.merge_fold(F.split(F.lit("aaa"), ""), "a", "a").alias("m3"),
        bpe.merge_fold(F.split(F.lit("abab"), ""), "a", "b").alias("ab"))
    row = df.collect()[0]
    assert row["m"] == ["aa", "aa"]
    assert row["m3"] == ["aa", "a"]
    assert row["ab"] == ["ab", "ab"]


def test_pair_counts_count_overlaps(spark):
    """'aaa' contributes (a,a) twice — Sennrich get_stats semantics."""
    words = bpe.with_symbols(
        spark.createDataFrame([("aaa", 2)], ["word", "freq"]))
    out = {(r["l"], r["r"]): r["cnt"]
           for r in bpe.adjacent_pair_counts(words).collect()}
    assert out == {("a", "a"): 4}


def test_single_symbol_words_contribute_nothing(spark):
    words = bpe.with_symbols(
        spark.createDataFrame([("a", 5), ("bc", 1)], ["word", "freq"]))
    out = {(r["l"], r["r"]): r["cnt"]
           for r in bpe.adjacent_pair_counts(words).collect()}
    assert out == {("b", "c"): 1}


def test_train_matches_reference_on_synthetic_corpus(spark):
    texts = ["the cat sat on the mat", "the cats sat", "a mat and a cat",
             "banana bandana", None, "aaaa aaa banana"]
    ref_merges, ref_words = ref_train(texts, 8)
    got = bpe.train_bpe(_docs(spark, texts), 8)
    assert got == ref_merges
    # encoded word table matches the reference's final state
    enc = bpe.encode_words(
        bpe.with_symbols(bpe.word_freqs(_docs(spark, texts))), got)
    enc_map = {r["word"]: (r["freq"], r["syms"]) for r in enc.collect()}
    assert enc_map == {w: (f, s) for w, (f, s) in ref_words.items()}


def test_train_stops_early_when_fully_merged(spark):
    """A corpus whose words all collapse before n_merges: the trainer
    returns fewer merges instead of failing or looping."""
    texts = ["ab ab ab"]
    merges = bpe.train_bpe(_docs(spark, texts), 5)
    assert [m["merged"] for m in merges] == ["ab"]


def test_tie_break_is_count_then_lexicographic(spark):
    """'xy' and 'yz' (wrapped so counts tie): lower (lhs, rhs) wins."""
    texts = ["xy yz", "xy yz"]
    merges = bpe.train_bpe(_docs(spark, texts), 1)
    assert (merges[0]["lhs"], merges[0]["rhs"]) == ("x", "y")


def test_min_freq_prunes_type_table(spark):
    texts = ["zz common common", "common"]
    words = bpe.word_freqs(_docs(spark, texts), min_freq=2)
    assert {r["word"] for r in words.collect()} == {"common"}


def test_vocab_and_encoded_stats_are_consistent(spark):
    """Total subword mass agrees between bpe_vocab (per-symbol) and
    encoded_stats (per-group) on the same merges."""
    texts = ["the cat sat", "the mat", "a cat sat"]
    df = spark.createDataFrame(
        [(t, "s%d" % (i % 2)) for i, t in enumerate(texts)],
        ["text", "source"])
    merges = bpe.train_bpe(df, 4)
    vocab_total = (bpe.bpe_vocab(df, merges)
                   .agg(F.sum("n_occurrences")).collect()[0][0])
    stats_total = (bpe.encoded_stats(df, merges)
                   .agg(F.sum("n_subword_tokens")).collect()[0][0])
    assert vocab_total == stats_total


def test_contract_queries_match_oracle_at_sf(spark, sf_dir):
    """The three registry entries replay bit-identically in DuckDB on
    the real fixture corpus (the same check the driver's harness runs,
    kept here so a bpe.py edit cannot silently drift the replay)."""
    duckdb = pytest.importorskip("duckdb")
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'")
    oracles = entrymod.oracle_sql()
    for name in ["bpe_merges", "bpe_vocab", "bpe_encoded_stats"]:
        sdf = entrymod.queries()[name](spark, sf_dir)
        cols = sorted(sdf.columns)
        got = sorted(map(tuple, sdf.select(*cols).collect()))
        want = sorted(map(tuple, con.execute(
            f"SELECT {', '.join(cols)} FROM ({oracles[name]})"
        ).fetchall()))
        assert got == want, name

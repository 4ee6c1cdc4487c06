"""Similarity-search operator tests (operators.similarity)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import types as T

from dump1090_db_stream_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_topk,
)

DIM = 16


def _vecs(n, seed=1):
    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(n)]


@pytest.fixture(scope="module")
def corpus(spark):
    vecs = _vecs(60)
    # plant a near-duplicate of vec 0 at id 59
    vecs[59] = [v + 0.01 for v in vecs[0]]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], schema)


def _py_cosine(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_brute_force_topk_matches_python(spark, corpus):
    queries = corpus.filter("vec_id = 0").withColumnRenamed("vec_id", "query_id")
    out = brute_force_topk(corpus, queries, k=5).collect()
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    # python oracle
    rows = {r.vec_id: list(r.embedding) for r in corpus.collect()}
    q = rows[0]
    want = sorted(((vid, _py_cosine(q, v)) for vid, v in rows.items() if vid != 0),
                  key=lambda t: (-t[1], t[0]))[:5]
    got = [(r.neighbor_id, r.cosine) for r in out]
    assert [w[0] for w in want] == [g[0] for g in got]
    assert got[0][0] == 59  # the planted near-dup ranks first
    for (wid, wc), (gid, gc) in zip(want, got):
        assert abs(wc - gc) < 1e-4


def test_lsh_topk_recall(spark, corpus):
    queries = corpus.filter("vec_id = 0").withColumnRenamed("vec_id", "query_id")
    exact = {r.neighbor_id for r in brute_force_topk(corpus, queries, k=5).collect()}
    approx = {r.neighbor_id
              for r in lsh_topk(corpus, queries, dim=DIM, k=5,
                                n_planes=6, n_tables=8).collect()}
    # the planted near-dup (cosine≈1) must always collide; the remaining
    # exact top-5 of random gaussians sit near cosine≈0.5 where LSH recall
    # is inherently probabilistic — require >= 2/5 overlap
    assert 59 in approx
    assert len(exact & approx) >= 2


def test_embedding_neardup_pairs(spark, corpus):
    out = embedding_neardup_pairs(corpus, dim=DIM, threshold=0.95,
                                  n_planes=8, n_tables=6).collect()
    pairs = {(r.id_a, r.id_b): r.cosine for r in out}
    assert (0, 59) in pairs
    assert pairs[(0, 59)] > 0.99

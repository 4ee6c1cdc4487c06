"""operators.classify — hashed-n-gram NB-weighted linear scoring
(Wang & Manning 2012 NBSVM baseline). The weight math is replicated
INDEPENDENTLY in Python (hashlib md5 -> bucket -> smoothed log-count
ratios) so a Spark-side arithmetic drift cannot self-confirm."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

B = 64  # small bucket space: collisions allowed, both sides replay them


def _bucket(unit: str, n_buckets: int = B) -> int:
    return int(hashlib.md5(unit.encode()).hexdigest()[:15], 16) % n_buckets


def _units(text: str, ngrams=(1, 2)) -> list[str]:
    toks = text.strip().split()
    out = []
    if 1 in ngrams:
        out += toks
    if 2 in ngrams:
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return out


POS = ["good clean prose here", "clean good text flows well",
       "prose reads well good"]
NEG = ["spam spam buy now", "buy spam click now now"]


def _corpus(spark):
    rows = [(i, t, True) for i, t in enumerate(POS)] + \
           [(100 + i, t, False) for i, t in enumerate(NEG)]
    return spark.createDataFrame(rows, ["doc_id", "text", "y"])


def test_nb_weights_match_independent_replication(spark):
    from dump1090_db_stream_spark.operators.classify import (
        nb_logodds_weights,
    )

    df = _corpus(spark)
    got = {r["bucket"]: (r["n_pos"], r["n_neg"], r["weight"])
           for r in nb_logodds_weights(df, "y", n_buckets=B).collect()}
    # independent replication
    from collections import Counter
    pos, neg = Counter(), Counter()
    for t in POS:
        pos.update(_bucket(u) for u in _units(t))
    for t in NEG:
        neg.update(_bucket(u) for u in _units(t))
    P, Q = sum(pos.values()), sum(neg.values())
    want = {}
    for b in set(pos) | set(neg):
        want[b] = (pos[b], neg[b],
                   math.log(((pos[b] + 1.0) / (P + B))
                            / ((neg[b] + 1.0) / (Q + B))))
    assert set(got) == set(want)
    for b in want:
        assert got[b][:2] == want[b][:2]
        assert got[b][2] == pytest.approx(want[b][2], abs=1e-12)


def test_scores_separate_the_classes(spark):
    from dump1090_db_stream_spark.operators.classify import (
        classifier_scores,
        nb_logodds_weights,
    )

    df = _corpus(spark)
    w = nb_logodds_weights(df, "y", n_buckets=B)
    got = {r["doc_id"]: r for r in
           classifier_scores(df, w, n_buckets=B).collect()}
    assert len(got) == 5
    pos_probs = [got[i]["prob"] for i in (0, 1, 2)]
    neg_probs = [got[i]["prob"] for i in (100, 101)]
    assert min(pos_probs) > max(neg_probs)
    for r in got.values():
        assert 0.0 < r["prob"] < 1.0
    # n_units = tokens + bigrams of each doc
    assert got[0]["n_units"] == len(_units(POS[0]))


def test_prob_is_length_invariant_under_unigrams(spark):
    """Mean normalization: repeating a document's text must not move
    its probability (fastText-style averaging) — checked with
    unigram-only features so repetition adds no new units."""
    from dump1090_db_stream_spark.operators.classify import (
        classifier_scores,
        nb_logodds_weights,
    )

    train = _corpus(spark)
    w = nb_logodds_weights(train, "y", n_buckets=B, ngrams=(1,))
    df = spark.createDataFrame(
        [(1, "good clean"), (2, "good clean " * 7)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           classifier_scores(df, w, n_buckets=B, ngrams=(1,)).collect()}
    assert got[1]["n_units"] == 2 and got[2]["n_units"] == 14
    assert got[1]["prob"] == got[2]["prob"]
    assert got[2]["score"] == pytest.approx(7 * got[1]["score"],
                                            abs=1e-5)


def test_unseen_buckets_take_the_default_weight(spark):
    from dump1090_db_stream_spark.operators.classify import (
        classifier_scores,
    )

    w = spark.createDataFrame(
        [(_bucket("good"), 2.0)], ["bucket", "weight"])
    df = spark.createDataFrame(
        [(1, "good zzzunseen")], ["doc_id", "text"])
    # default 0: only 'good' contributes; 3 units (2 tokens + 1 bigram)
    r0 = classifier_scores(df, w, n_buckets=B, ngrams=(1, 2)).first()
    assert r0["n_units"] == 3 and r0["score"] == pytest.approx(2.0)
    rd = classifier_scores(df, w, n_buckets=B, ngrams=(1, 2),
                           default_weight=-1.0).first()
    assert rd["score"] == pytest.approx(0.0)  # 2.0 + 2 * -1.0


def test_validation(spark):
    from dump1090_db_stream_spark.operators.classify import (
        classifier_scores,
        nb_logodds_weights,
    )

    df = _corpus(spark)
    with pytest.raises(ValueError, match="n_buckets"):
        nb_logodds_weights(df, "y", n_buckets=1)
    with pytest.raises(ValueError, match="ngrams"):
        nb_logodds_weights(df, "y", ngrams=(3,))
    with pytest.raises(ValueError, match="alpha"):
        nb_logodds_weights(df, "y", alpha=0.0)
    with pytest.raises(ValueError, match="ngrams"):
        classifier_scores(df, df.select(
            F.lit(0).alias("bucket"), F.lit(0.0).alias("weight")),
            ngrams=())


def test_null_labels_are_excluded(spark):
    from dump1090_db_stream_spark.operators.classify import (
        nb_logodds_weights,
    )

    base = _corpus(spark)
    dirty = base.union(base.sparkSession.createDataFrame(
        [(999, "mystery words here", None)], base.schema))
    want = sorted(map(tuple, nb_logodds_weights(
        base, "y", n_buckets=B).collect()))
    got = sorted(map(tuple, nb_logodds_weights(
        dirty, "y", n_buckets=B).collect()))
    assert got == want


def test_scores_stay_jvm_side(spark):
    """No Python in the train+score plan (the module's design rule)."""
    from dump1090_db_stream_spark.operators.classify import (
        classifier_scores,
        nb_logodds_weights,
    )

    df = _corpus(spark)
    out = classifier_scores(df, nb_logodds_weights(df, "y",
                                                   n_buckets=B),
                            n_buckets=B)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

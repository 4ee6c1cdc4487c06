"""Cache lifecycle: operator-internal persists are tracked and released
by the caller (ADVICE: long-lived sessions must not accumulate storage)."""

from __future__ import annotations

from dump1090_db_stream_spark.cache import release_tracked


def test_release_tracked_frees_operator_persists(spark):
    from dump1090_db_stream_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i % 2}") for i in range(20)],
        ["doc_id", "text"])
    release_tracked()  # start clean
    out = ngram_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                              threshold=0.5)
    out.count()  # consuming action materializes the tracked persist
    jsc = spark.sparkContext._jsc.sc()
    assert jsc.getPersistentRDDs().size() > 0
    assert release_tracked() > 0
    assert jsc.getPersistentRDDs().size() == 0
    assert release_tracked() == 0  # idempotent

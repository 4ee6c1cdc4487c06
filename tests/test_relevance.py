"""TF-IDF / BM25 scoring (operators.relevance) against hand-computed
values on a three-document corpus."""

from __future__ import annotations

import math

import pytest

from dump1090_db_stream_spark.operators.relevance import (
    bm25_scores,
    tfidf_terms,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "apple banana apple"),
         (2, "banana cherry"),
         (3, "cherry cherry cherry")],
        ["doc_id", "text"])


def test_tfidf_known_values(corpus):
    rows = {(r["doc_id"], r["term"]): r
            for r in tfidf_terms(corpus).collect()}
    assert rows[(1, "apple")]["tf"] == 2
    assert rows[(1, "apple")]["df"] == 1
    assert rows[(1, "apple")]["idf"] == pytest.approx(math.log(3), abs=1e-6)
    assert rows[(1, "apple")]["tfidf"] == pytest.approx(
        2 * math.log(3), abs=1e-6)
    # term in 2 of 3 docs
    assert rows[(2, "banana")]["idf"] == pytest.approx(
        math.log(1.5), abs=1e-6)
    # cherry tf=3 in doc 3
    assert rows[(3, "cherry")]["tfidf"] == pytest.approx(
        3 * math.log(1.5), abs=1e-6)


def test_bm25_known_values(corpus):
    k1, b = 1.2, 0.75
    got = {r["doc_id"]: r for r in
           bm25_scores(corpus, ["apple", "cherry"], k1=k1, b=b).collect()}
    # doc 2 matches cherry only; doc 1 apple only; doc 3 cherry only
    assert got[1]["n_matched"] == 1
    assert got[2]["n_matched"] == 1
    assert got[3]["n_matched"] == 1
    n, avgdl = 3, 8 / 3
    dl = {1: 3, 2: 2, 3: 3}

    def bm25(tf, df, d):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * dl[d] / avgdl))

    assert got[1]["score"] == pytest.approx(bm25(2, 1, 1), abs=1e-6)
    assert got[2]["score"] == pytest.approx(bm25(1, 2, 2), abs=1e-6)
    assert got[3]["score"] == pytest.approx(bm25(3, 2, 3), abs=1e-6)


def test_bm25_only_matching_docs_returned(corpus):
    out = bm25_scores(corpus, ["durian"]).collect()
    assert out == []


def test_tfidf_single_shuffle_on_big_side(corpus):
    plan = (tfidf_terms(corpus)
            ._jdf.queryExecution().executedPlan().toString())
    # the (doc, term) relation shuffles once; df/N come back via
    # BroadcastExchange, not extra hash exchanges of the big side
    assert plan.count("BroadcastExchange") >= 2


def test_bigram_pmi_known_values(spark):
    from dump1090_db_stream_spark.operators.relevance import bigram_pmi

    # "new york" appears 3x; unigrams: new=4, york=3; U=11 tokens,
    # B=9 bigrams (doc1: 5, doc2: 4)
    df = spark.createDataFrame(
        [(1, "a new york a new york"),
         (2, "a a new york new")],
        ["doc_id", "text"])
    got = {(r["w1"], r["w2"]): r
           for r in bigram_pmi(df, min_count=1).collect()}
    u, b = 11, 9
    r = got[("new", "york")]
    assert (r["c_xy"], r["c_x"], r["c_y"]) == (3, 4, 3)
    assert r["pmi"] == pytest.approx(
        math.log(3 * u * u / (b * 4 * 3)), abs=1e-6)


def test_bigram_pmi_min_count_prunes_rows_not_totals(spark):
    from dump1090_db_stream_spark.operators.relevance import bigram_pmi

    df = spark.createDataFrame(
        [(1, "x y x y z q")], ["doc_id", "text"])
    # B must count ALL 5 bigrams even though min_count=2 keeps only
    # "x y" (2 occurrences); a post-filter total would inflate pmi
    r = bigram_pmi(df, min_count=2).collect()
    assert len(r) == 1 and (r[0]["w1"], r[0]["w2"]) == ("x", "y")
    u, b = 6, 5
    assert r[0]["pmi"] == pytest.approx(
        math.log(2 * u * u / (b * 2 * 2)), abs=1e-6)


def test_bigram_single_token_docs_contribute_nothing(spark):
    from dump1090_db_stream_spark.operators.relevance import bigram_counts

    df = spark.createDataFrame([(1, "solo"), (2, "a b")],
                               ["doc_id", "text"])
    rows = bigram_counts(df).collect()
    assert [(r["w1"], r["w2"], r["c_xy"]) for r in rows] == [("a", "b", 1)]


def test_unigram_logprob_known_values(spark):
    from dump1090_db_stream_spark.operators.relevance import unigram_logprob

    # corpus: "a a b" + "a z": U=5, c_a=3, c_b=1, c_z=1
    df = spark.createDataFrame([(1, "a a b"), (2, "a z")],
                               ["doc_id", "text"])
    got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    lp1 = (2 * math.log(3 / 5) + 1 * math.log(1 / 5)) / 3
    lp2 = (math.log(3 / 5) + math.log(1 / 5)) / 2
    assert got[1]["n_toks"] == 3 and got[2]["n_toks"] == 2
    assert got[1]["logprob"] == pytest.approx(lp1, abs=1e-6)
    assert got[2]["logprob"] == pytest.approx(lp2, abs=1e-6)
    # the rare-token doc scores lower — the filterable signal
    assert got[2]["logprob"] < got[1]["logprob"]


def test_bigram_logprob_orders_gibberish_below_templates(spark):
    import math

    import pytest

    from dump1090_db_stream_spark.operators.relevance import bigram_logprob

    # 10 templated docs share every bigram; the shuffled doc uses the
    # SAME unigrams in an order never seen elsewhere
    template = "the quick brown fox jumps over the lazy dog"
    docs = [(i, template) for i in range(10)]
    docs.append((10, "dog the over quick lazy brown the jumps fox"))
    docs.append((11, "solo"))  # 1 token -> no bigrams -> absent
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in bigram_logprob(df, lam=0.75).collect()}
    assert 11 not in got and len(got) == 11
    assert got[0]["n_bigrams"] == 8
    assert got[10]["logprob"] < got[0]["logprob"]
    # closed-form check for the templated docs: every bigram occurs 10x,
    # c(w1): 'the' 21 (10 docs x 2 + shuffled 2 -> 22? count corpus-wide)
    # -> just verify against a hand computation of the same formula
    from collections import Counter

    toks = [d[1].split() for d in docs]
    uni = Counter(t for ts in toks for t in ts)
    u = sum(uni.values())
    big = Counter((ts[i], ts[i + 1]) for ts in toks
                  for i in range(len(ts) - 1))
    ts = toks[0]
    s = n = 0
    for i in range(len(ts) - 1):
        w1, w2 = ts[i], ts[i + 1]
        p = 0.75 * big[(w1, w2)] / uni[w1] + 0.25 * uni[w2] / u
        s += math.log(p)
        n += 1
    assert got[0]["logprob"] == pytest.approx(round(s / n, 6), abs=1e-6)
    with pytest.raises(ValueError, match="lam"):
        bigram_logprob(df, lam=1.5)


# --- keyness_terms (Dunning G^2) -----------------------------------------


def ref_g2(a: int, n_g: int, c_t: int, n_all: int) -> float:
    """Independent 2x2 log-likelihood: G2 = 2*sum O*ln(O/E)."""
    cells = [(a, n_g, c_t), (c_t - a, n_all - n_g, c_t),
             (n_g - a, n_g, n_all - c_t),
             (n_all - n_g - (c_t - a), n_all - n_g, n_all - c_t)]
    tot = 0.0
    for o, row, col in cells:
        if o > 0:
            tot += o * math.log(o * n_all / (row * col))
    return 2.0 * tot


@pytest.fixture(scope="module")
def keyness_corpus(spark):
    return spark.createDataFrame(
        [(1, "web", "click buy cart click buy"),
         (2, "web", "click cart checkout buy"),
         (3, "news", "senate vote bill senate"),
         (4, "news", "vote bill click")],
        ["doc_id", "source", "text"])


def test_keyness_matches_reference_contingency(keyness_corpus):
    from dump1090_db_stream_spark.operators.relevance import keyness_terms

    rows = {(r["source"], r["term"]): r
            for r in keyness_terms(keyness_corpus,
                                   min_count=1).collect()}
    # margins: web has 9 tokens, news has 7, N=16
    r = rows[("web", "click")]
    assert (r["c_gt"], r["n_g"], r["c_t"], r["n_all"]) == (3, 9, 4, 16)
    assert r["g2"] == pytest.approx(ref_g2(3, 9, 4, 16), abs=1e-6)
    assert r["overused"] is True          # 3/9 > 4/16
    r = rows[("news", "click")]
    assert r["g2"] == pytest.approx(ref_g2(1, 7, 4, 16), abs=1e-6)
    assert r["overused"] is False         # 1/7 < 4/16
    # a term exclusive to one source: b-cell (and only it) empties
    r = rows[("news", "senate")]
    assert r["c_t"] == r["c_gt"] == 2
    assert r["g2"] == pytest.approx(ref_g2(2, 7, 2, 16), abs=1e-6)
    assert r["overused"] is True


def test_keyness_min_count_prunes_output_not_margins(keyness_corpus):
    from dump1090_db_stream_spark.operators.relevance import keyness_terms

    pruned = keyness_terms(keyness_corpus, min_count=2)
    rows = {(r["source"], r["term"]): r for r in pruned.collect()}
    assert ("news", "click") not in rows          # c_gt = 1 pruned
    # margins still count the pruned mass
    assert rows[("web", "click")]["n_all"] == 16
    assert rows[("web", "click")]["c_t"] == 4


def test_keyness_symmetric_corpus_is_flat(spark):
    """Identical per-source distributions: every G2 is exactly 0."""
    from dump1090_db_stream_spark.operators.relevance import keyness_terms

    df = spark.createDataFrame(
        [(1, "a", "x y z"), (2, "b", "x y z")],
        ["doc_id", "source", "text"])
    for r in keyness_terms(df, min_count=1).collect():
        assert r["g2"] == 0.0, r

"""Edit-distance join (operators.fuzzy): lossless prefix filter,
short-string fallback, candidate dedup, and plan shape."""

from __future__ import annotations

from dump1090_db_stream_spark.operators.fuzzy import edit_distance_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(strings: list[str], k: int) -> set[tuple[int, int, int]]:
    out = set()
    for i in range(len(strings)):
        for j in range(i + 1, len(strings)):
            d = _lev(strings[i], strings[j])
            if d <= k:
                out.add((i, j, d))
    return out


def _join_pairs(spark, strings: list[str], k: int, q: int = 2):
    df = spark.createDataFrame(list(enumerate(strings)), ["sid", "s"])
    res = edit_distance_join(df, "sid", "s", k=k, q=q)
    return {(r.id1, r.id2, r.dist) for r in res.collect()}


def test_matches_brute_force_mixed_lengths(spark):
    # includes strings below the prefix-filter floor (the "ab" vs "cd"
    # counterexample class) — the broadcast fallback must find them
    strings = ["ab", "cd", "abc", "abd", "abcd", "xabc", "hello world",
               "hello world!", "hallo world", "spark", "sparc", "spork",
               "a", "b", "", "query engine", "query engines"]
    k = 2
    assert _join_pairs(spark, strings, k=k) == _brute(strings, k)


def test_matches_brute_force_k1(spark):
    strings = [f"Customer#{i:09d}" for i in range(40)] + ["Customer#0000000x1"]
    assert _join_pairs(spark, strings, k=1) == _brute(strings, 1)


def test_duplicate_grams_counted_as_multiset(spark):
    # "aaaa" vs "aaab": shared grams are the multiset {aa, aa} ∩ {aa, ab};
    # occurrence numbering must not collapse or double-count them
    strings = ["aaaa", "aaab", "aaba", "bbbb"]
    assert _join_pairs(spark, strings, k=1) == _brute(strings, 1)


def test_no_duplicate_pairs(spark):
    strings = ["abcdefgh", "abcdefgx", "abcdefgy"]
    df = spark.createDataFrame(list(enumerate(strings)), ["sid", "s"])
    res = edit_distance_join(df, "sid", "s", k=1).collect()
    pairs = [(r.id1, r.id2) for r in res]
    assert len(pairs) == len(set(pairs))
    assert all(r.id1 < r.id2 for r in res)


def test_long_path_is_an_equi_join_not_cross(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    res = edit_distance_join(cust, "c_custkey", "c_name", k=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # candidate generation must be a hash/sort-merge equi-join on the
    # prefix element; only the documented short-bucket fallback may be
    # a broadcast nested loop, and nothing may be a cartesian product
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan


def test_candidate_volume_guard(spark):
    """The q-tuning note is now an enforced contract: a low-alphabet
    key set (zero-padded numeric ids, q=2 -> at most 100 digit bigrams)
    must trip the guard; raising q to 3 restores diversity and passes."""
    import warnings

    import pytest

    strings = [f"{i:012d}" for i in range(400)]
    df = spark.createDataFrame(list(enumerate(strings)), ["sid", "s"])
    with pytest.raises(ValueError, match="candidate-volume guard"):
        edit_distance_join(df, "sid", "s", k=1, q=2,
                           max_candidate_ratio=8.0, on_exceed="raise")
    # default policy warns (with the raise-q remedy) instead of failing
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        edit_distance_join(df, "sid", "s", k=1, q=2,
                           max_candidate_ratio=8.0).count()
    assert any("raise q" in str(w.message) for w in caught)
    # a gram-diverse corpus of the same size stays under the same
    # ratio and is silent — the guard keys on diversity, not volume
    import random

    rng = random.Random(11)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    diverse = ["".join(rng.choice(alpha) for _ in range(12))
               for _ in range(400)]
    ddf = spark.createDataFrame(list(enumerate(diverse)), ["sid", "s"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = {(r.id1, r.id2, r.dist) for r in edit_distance_join(
            ddf, "sid", "s", k=1, q=2, max_candidate_ratio=8.0).collect()}
    assert not any("candidate-volume" in str(w.message) for w in caught)
    assert got == _brute(diverse, 1)
    with pytest.raises(ValueError, match="on_exceed"):
        edit_distance_join(df, "sid", "s", on_exceed="explode")


# --- r14: deletion-neighborhood blocking (method="deletions") ---------------


def _del_pairs(spark, strings: list[str], k: int):
    df = spark.createDataFrame(list(enumerate(strings)), ["sid", "s"])
    res = edit_distance_join(df, "sid", "s", k=k, method="deletions")
    return {(r.id1, r.id2, r.dist) for r in res.collect()}


def test_deletions_matches_brute_force_mixed_lengths(spark):
    # the prefix path's hard cases — short strings, empty string,
    # duplicate-gram content — must fall out of the same equi-join
    # (no fallback branch exists on this path)
    strings = ["ab", "cd", "abc", "abd", "abcd", "xabc", "hello world",
               "hello world!", "hallo world", "spark", "sparc", "spork",
               "a", "b", "", "query engine", "query engines",
               "aaaa", "aaab", "aaba", "bbbb"]
    for k in (1, 2):
        assert _del_pairs(spark, strings, k) == _brute(strings, k)


def test_deletions_matches_prefix_on_customer_names(spark):
    # the call-site shape: zero-padded numeric tails (the measured
    # low-gram-diversity blowup case for the prefix filter)
    strings = [f"Customer#{i:09d}" for i in range(60)] + [
        "Customer#0000000x1", "Customer#00000001"]
    assert _del_pairs(spark, strings, 1) == _brute(strings, 1)


def test_deletions_rejects_large_k(spark):
    import pytest

    df = spark.createDataFrame([(0, "abc")], ["sid", "s"])
    with pytest.raises(ValueError, match="k in \\(1, 2\\)"):
        edit_distance_join(df, "sid", "s", k=3, method="deletions")
    with pytest.raises(ValueError, match="method"):
        edit_distance_join(df, "sid", "s", method="anagram")


def test_deletions_is_equi_join_not_cross(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    res = edit_distance_join(cust, "c_custkey", "c_name", k=1,
                             method="deletions")
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan

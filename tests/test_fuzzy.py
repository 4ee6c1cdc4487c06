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

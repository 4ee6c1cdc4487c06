"""operators.drift.ks_drift_by — exact two-sample KS vs a brute-force
pure-Python reference, edge contracts, and the prefix-sum equivalence.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.drift import ks_drift_by


def ref_ks(group_vals: list[float], rest_vals: list[float]) -> float:
    """Brute force: evaluate |F_g - F_rest| at BOTH one-sided limits of
    every point of either sample (the sup of a difference of step
    functions is attained at a jump of one of them)."""
    pts = sorted(set(group_vals) | set(rest_vals))
    ng, nr = len(group_vals), len(rest_vals)
    d = 0.0
    for x in pts:
        for cmp_ in ((lambda v: v <= x), (lambda v: v < x)):
            fg = sum(1 for v in group_vals if cmp_(v)) / ng
            fr = sum(1 for v in rest_vals if cmp_(v)) / nr
            d = max(d, abs(fg - fr))
    return d


def _fixture(spark):
    # deterministic interleaved values with ties within AND across
    # groups, three groups of different sizes
    rows = []
    for i in range(120):
        rows.append(("a", float((i * 7) % 40)))
    for i in range(80):
        rows.append(("b", float((i * 11) % 40 + 10)))
    for i in range(50):
        rows.append(("c", float((i * 13) % 25)))
    return spark.createDataFrame(rows, "g string, s double"), rows


def test_ks_matches_bruteforce_reference(spark):
    df, rows = _fixture(spark)
    got = {r["g"]: r for r in ks_drift_by(df, "s", "g").collect()}
    for g in ("a", "b", "c"):
        grp = [s for gg, s in rows if gg == g]
        rest = [s for gg, s in rows if gg != g]
        assert got[g]["n"] == len(grp)
        assert got[g]["n_rest"] == len(rest)
        assert got[g]["ks"] == round(ref_ks(grp, rest), 6), g
        crit = (math.sqrt(-math.log(0.025) / 2.0)
                * math.sqrt((len(grp) + len(rest))
                            / (len(grp) * len(rest))))
        assert got[g]["ks_crit_05"] == round(crit, 6)
        assert got[g]["drifted"] == (ref_ks(grp, rest) > crit)


def test_disjoint_supports_give_ks_one(spark):
    rows = [("lo", float(i)) for i in range(30)] + \
           [("hi", float(i + 1000)) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, s double")
    got = {r["g"]: r for r in ks_drift_by(df, "s", "g").collect()}
    assert got["lo"]["ks"] == 1.0 and got["lo"]["drifted"] is True
    assert got["hi"]["ks"] == 1.0


def test_single_group_emits_null_not_error(spark):
    df = spark.createDataFrame([("only", float(i)) for i in range(10)],
                               "g string, s double")
    [r] = ks_drift_by(df, "s", "g").collect()
    assert r["n_rest"] == 0
    assert r["ks"] is None
    assert r["ks_crit_05"] is None
    assert r["drifted"] is None


def test_null_nan_scores_and_null_groups_excluded(spark):
    df, rows = _fixture(spark)
    noisy = df.unionByName(spark.createDataFrame(
        [("a", None), ("b", float("nan")), (None, 3.0)],
        "g string, s double"))
    assert (ks_drift_by(noisy, "s", "g").orderBy("g").collect()
            == ks_drift_by(df, "s", "g").orderBy("g").collect())


def test_bucket_decomposition_is_exact(spark):
    """n_range_buckets only re-balances load: 1 (degenerate single
    bucket) and 7 (uneven) must be bit-identical to the default 64."""
    df, _ = _fixture(spark)
    base = ks_drift_by(df, "s", "g").orderBy("g").collect()
    for nb in (1, 7):
        assert ks_drift_by(df, "s", "g", n_range_buckets=nb) \
            .orderBy("g").collect() == base


def test_shuffle_bounds_join_is_bit_identical(spark):
    df, _ = _fixture(spark)
    assert (ks_drift_by(df, "s", "g", bounds_join="shuffle")
            .orderBy("g").collect()
            == ks_drift_by(df, "s", "g").orderBy("g").collect())


def test_integer_scores_cast_and_tie_credit(spark):
    """Heavy ties (integer scores, few distinct values) — the left/
    right limit evaluation must still match brute force exactly."""
    rows = ([("x", v) for v in [1, 1, 1, 2, 2, 3]]
            + [("y", v) for v in [1, 2, 2, 2, 3, 3]])
    df = spark.createDataFrame(rows, "g string, s int")
    got = {r["g"]: r for r in ks_drift_by(df, "s", "g").collect()}
    for g in ("x", "y"):
        grp = [float(s) for gg, s in rows if gg == g]
        rest = [float(s) for gg, s in rows if gg != g]
        assert got[g]["ks"] == round(ref_ks(grp, rest), 6), g

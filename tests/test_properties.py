"""Property-based tests (hypothesis): invariants that hold for ALL
inputs, not just the golden fixtures.

Examples are batched into ONE Spark job per test (hypothesis generates a
list, Spark processes it as one DataFrame) so runtime stays bounded.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dump1090_db_stream_spark.functions.parser import (
    parse_sbs1,
    parse_sbs1_lines,
)

# A wire "field": printable, no comma/newline (the CSV delimiters).
field = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           exclude_characters=",\n\r"),
    max_size=8)


@st.composite
def wire_line(draw):
    n_fields = draw(st.integers(min_value=1, max_value=30))
    return ",".join(draw(field) for _ in range(n_fields))


@settings(max_examples=5, deadline=None)
@given(st.lists(wire_line(), min_size=1, max_size=200))
def test_parser_never_crashes_and_keeps_width_invariant(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    # layer 1 — parse_sbs1_lines: width filter only (F-4). Exactly the
    # 22-field lines survive; no input can crash the parse (F-8 try_cast).
    raw = parse_sbs1_lines(df).collect()
    n_22 = sum(1 for ln in lines if len(ln.split(",")) == 22)
    assert len(raw) == n_22
    for r in raw:
        assert r.altitude is None or isinstance(r.altitude, int)
        assert r.ground_speed is None or isinstance(r.ground_speed, int)
    # layer 2 — parse_sbs1 adds NOT NULL enforcement (the reference's
    # INSERT-rejection semantics): a subset of layer 1, with the
    # required columns always present.
    full = parse_sbs1(df).collect()
    assert len(full) <= n_22
    for r in full:
        assert r.hex_ident is not None
        assert r.transmission_type is not None
        assert r.generated_date is not None and r.generated_time is not None


@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.tuples(st.sampled_from("ABC"),
                       st.integers(min_value=0, max_value=50)),
             min_size=1, max_size=40),
    st.lists(st.tuples(st.sampled_from("ABC"),
                       st.integers(min_value=0, max_value=50),
                       st.floats(min_value=0, max_value=10,
                                 allow_nan=False)),
             min_size=0, max_size=40),
)
def test_asof_join_equals_naive_oracle(spark, left_rows, right_rows):
    from dump1090_db_stream_spark.operators.sessions import asof_join

    # dedup right on (key, ts) — the operator's documented precondition
    # (ambiguous ties otherwise); keep the max value like a last-wins feed
    rmap: dict[tuple[str, int], float] = {}
    for k, t, v in right_rows:
        rmap[(k, t)] = max(v, rmap.get((k, t), float("-inf")))
    rclean = [(k, t, v) for (k, t), v in rmap.items()]

    left = spark.createDataFrame(left_rows, ["k", "t"])
    right = spark.createDataFrame(rclean, ["k", "t", "v"]) if rclean else \
        spark.createDataFrame([], "k string, t long, v double")
    got = {}
    for r in asof_join(left, right, key="k", left_ts="t").collect():
        got.setdefault((r.k, r.t), set()).add(r.v_asof)

    for k, t in set(left_rows):
        preceding = [(rt, v) for (rk, rt), v in rmap.items()
                     if rk == k and rt <= t]
        want = max(preceding)[1] if preceding else None
        assert got[(k, t)] == {want}, (k, t)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-84.0, max_value=84.0,
                      allow_nan=False, allow_infinity=False),
            st.floats(min_value=-170.0, max_value=170.0,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=40,
    ),
    st.floats(min_value=10.0, max_value=800.0,
              allow_nan=False, allow_infinity=False),
)
def test_radius_join_cell_cover_is_lossless(spark, coords, radius):
    """For ANY scatter of points (centers = the same scatter, so every
    point matches at least itself) and ANY radius, the grid-bucketed
    radius join returns exactly the brute-force within-radius set —
    the cell cover never drops a pair, at any latitude."""
    from pyspark.sql import functions as F

    from dump1090_db_stream_spark.operators.geo import (
        haversine_km,
        radius_join,
    )

    pts = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(coords)],
        ["point_id", "lat", "lon"])
    ctr = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(coords)],
        ["center_id", "clat", "clon"])
    fast = {(r["point_id"], r["center_id"]) for r in radius_join(
        pts, ctr, radius, center_lat="clat", center_lon="clon").collect()}
    brute = {(r["point_id"], r["center_id"]) for r in (
        pts.crossJoin(ctr)
        .withColumn("d", haversine_km(F.col("lat"), F.col("lon"),
                                      F.col("clat"), F.col("clon")))
        .filter(F.col("d") <= radius)).collect()}
    assert fast == brute
    assert len(fast) >= len(coords)  # self-pairs always inside

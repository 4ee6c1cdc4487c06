"""Connected components / dedup clustering (operators.graph)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dump1090_db_stream_spark.operators.graph import (
    canonical_map,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["id_a", "id_b"])


def test_components_basic(spark):
    comp = {r["id"]: r["comp"] for r in connected_components(
        _edges(spark, [(1, 2), (2, 3), (5, 6)])).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_components_long_chain_converges(spark):
    # a 40-node path: worst case for min-propagation (diameter rounds)
    comp = {r["id"]: r["comp"] for r in connected_components(
        _edges(spark, [(i, i + 1) for i in range(40)]),
        max_iterations=50, local_threshold=0).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 41


def test_components_direction_independent(spark):
    a = connected_components(_edges(spark, [(9, 1), (1, 4)])).collect()
    b = connected_components(_edges(spark, [(1, 9), (4, 1)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_canonical_map_covers_singletons(spark):
    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    pairs = _edges(spark, [(0, 3), (3, 7)])
    got = {r["doc_id"]: r["canonical_id"]
           for r in canonical_map(docs, pairs).collect()}
    assert got == {0: 0, 3: 0, 7: 0, 1: 1, 2: 2, 4: 4, 5: 5, 6: 6}
    # dedup rule: keep iff id == canonical -> exactly 6 survivors
    assert sum(1 for k, v in got.items() if k == v) == 6


@pytest.mark.slow
def test_star_equals_propagation_on_random_graphs(spark):
    """Property check: large-star/small-star contraction produces the
    SAME (id, component) labeling as min-label propagation on seeded
    random graphs of varying density (including multi-component and
    duplicate/reversed edges)."""
    import random

    from dump1090_db_stream_spark.operators.graph import (
        connected_components_star,
    )

    for seed, n, m in [(1, 30, 15), (2, 30, 45), (3, 50, 25), (4, 12, 66)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        pairs = [(a, b) for a, b in pairs if a != b]
        base = sorted(map(tuple, connected_components(
            _edges(spark, pairs), max_iterations=60,
            local_threshold=0).collect()))
        star = sorted(map(tuple, connected_components_star(
            _edges(spark, pairs), local_threshold=0).collect()))
        assert star == base, f"seed={seed}"


def test_star_chain_converges_logarithmically(spark):
    """The reason the star variant exists: a 64-node path has diameter
    63 (63 propagation rounds) but star contraction must close it in
    O(log n) — assert single digits."""
    from dump1090_db_stream_spark.operators.graph import (
        connected_components_star,
    )

    rounds: list[int] = []
    comp = {r["id"]: r["comp"] for r in connected_components_star(
        _edges(spark, [(i, i + 1) for i in range(63)]),
        rounds_out=rounds, local_threshold=0).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 64
    assert rounds[0] <= 8, rounds


def test_wide_string_ids_fall_back_to_distributed(spark, monkeypatch):
    """r15 (r14 VERDICT #5): the local fast path's admission is
    id-byte-aware — a graph whose ROW count fits the ceiling but whose
    string ids blow the byte budget must take the distributed loop
    (identical labels), while a numeric-id graph of the same shape
    keeps the local path."""
    from dump1090_db_stream_spark.operators import graph
    from dump1090_db_stream_spark.operators.graph import (
        connected_components_star,
    )

    str_pairs = [(f"doc_{'x' * 30}_{i}", f"doc_{'x' * 30}_{i + 1}")
                 for i in range(6)]
    # ~73 raw bytes/row x 6 canonical rows ~ 440 > 200 -> byte cap
    # rejects the local path
    monkeypatch.setattr(graph, "LOCAL_CC_MAX_ID_BYTES", 200)
    rounds: list[int] = []
    comp = {r["id"]: r["comp"] for r in connected_components_star(
        _edges(spark, str_pairs), rounds_out=rounds).collect()}
    assert rounds and rounds[0] >= 1          # distributed loop ran
    assert set(comp.values()) == {str_pairs[0][0]}
    # same labels as the forced-distributed and forced-local routes
    forced = {r["id"]: r["comp"] for r in connected_components(
        _edges(spark, str_pairs), local_threshold=0).collect()}
    assert comp == forced
    # numeric ids: 16 raw bytes/row x 6 rows = 96 < 200 -> local kept
    rounds2: list[int] = []
    num = {r["id"]: r["comp"] for r in connected_components_star(
        _edges(spark, [(i, i + 1) for i in range(6)]),
        rounds_out=rounds2).collect()}
    assert rounds2 == [0]
    assert set(num.values()) == {0}


def test_canonical_map_star_algorithm(spark):
    docs = spark.range(8).select(F.col("id").alias("doc_id"))
    pairs = _edges(spark, [(0, 3), (3, 7)])
    got = {r["doc_id"]: r["canonical_id"]
           for r in canonical_map(docs, pairs, algorithm="star").collect()}
    assert got == {0: 0, 3: 0, 7: 0, 1: 1, 2: 2, 4: 4, 5: 5, 6: 6}


def test_dedup_survivors_keeps_one_per_cluster(spark):
    from dump1090_db_stream_spark.operators.graph import dedup_survivors

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], ["doc_id", "text"])
    pairs = _edges(spark, [(0, 3), (3, 7), (5, 6)])
    kept = sorted(r["doc_id"] for r in
                  dedup_survivors(docs, pairs).collect())
    # cluster {0,3,7} -> 0; cluster {5,6} -> 5; singletons 1,2,4 stay
    assert kept == [0, 1, 2, 4, 5]
    # all columns survive
    assert dedup_survivors(docs, pairs).columns == ["doc_id", "text"]


def test_nonconvergence_raises_instead_of_wrong_labels(spark):
    """An exhausted iteration cap must raise, not return a silently
    wrong labeling (dedup_survivors would act on it)."""
    import pytest

    from dump1090_db_stream_spark.operators.graph import (
        connected_components_star,
    )

    chain = _edges(spark, [(i, i + 1) for i in range(30)])
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components_star(chain, max_iterations=2,
                                  local_threshold=0).collect()
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(chain, max_iterations=3,
                             local_threshold=0).collect()


def test_triangles_known_graph(spark):
    from dump1090_db_stream_spark.operators.graph import triangles

    # K4 on {1,2,3,4} (4 triangles) + square {5,6,7,8} (0) + dangling
    # edge; edges given in MIXED orientation with a duplicate
    edges = [(1, 2), (1, 3), (1, 4), (3, 2), (2, 4), (4, 3),
             (5, 6), (6, 7), (8, 7), (5, 8),
             (9, 10), (2, 1)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {(r["a"], r["b"], r["c"]) for r in triangles(df).collect()}
    assert got == {(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)}


def test_triangles_count_each_once(spark):
    from dump1090_db_stream_spark.operators.graph import triangles

    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)],
                               ["id_a", "id_b"])
    rows = triangles(df).collect()
    assert len(rows) == 1 and (rows[0]["a"], rows[0]["b"],
                               rows[0]["c"]) == (1, 2, 3)


def test_best_survivors_keeps_highest_score(spark):
    from dump1090_db_stream_spark.operators.graph import best_survivors

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (5, 0.1)],
        ["doc_id", "score"],
    )
    # cluster {1,2,3}: 2 and 3 tie on score -> min id 2 wins;
    # {4}, {5} are singletons and survive as their own canonical
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    got = {r["doc_id"]: r for r in
           best_survivors(docs, pairs, "score").collect()}
    assert set(got) == {2, 4, 5}
    assert got[2]["canonical_id"] == 1  # cluster key is the component min
    assert got[4]["canonical_id"] == 4
    assert got[2]["score"] == 0.9  # full input schema preserved


def test_pagerank_known_graph_and_invariants(spark):
    from dump1090_db_stream_spark.operators.graph import pagerank

    # path graph 1-2-3 plus isolated node 4: the middle node must rank
    # highest, the ends equal by symmetry, the isolate at teleport mass
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], ["id"])
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    got = {r["id"]: r["pagerank"]
           for r in pagerank(nodes, edges, n_iters=3).collect()}
    # replicate the fixed-iteration recipe in plain Python
    n, d = 4, 0.85
    base = (1.0 - d) / n
    deg = {1: 1, 2: 2, 3: 1}
    adj = {1: [2], 2: [1, 3], 3: [2], 4: []}
    r = {i: 1.0 / n for i in (1, 2, 3, 4)}
    for _ in range(3):
        nxt = {}
        for i in (1, 2, 3, 4):
            s = 0.0
            for j in sorted(k for k in adj if i in adj[k]):
                s += r[j] / deg[j]
            nxt[i] = base + d * s
        r = nxt
    import math

    for i in (1, 2, 3, 4):
        assert got[i] == math.floor(r[i] * 1e6 + 0.5) / 1e6, i
    assert got[2] > got[1] == got[3] > got[4]
    import pytest

    with pytest.raises(ValueError, match="damping"):
        pagerank(nodes, edges, damping=1.5)


def test_pagerank_empty_nodes_and_duplicate_ids(spark):
    """r6 ADVICE: N == 0 must raise a clear error (not
    ZeroDivisionError), and duplicate ids in `nodes` must not inflate
    N or duplicate output rows — ids are distinct()ed."""
    import pytest

    from dump1090_db_stream_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "id string")
    edges = spark.createDataFrame([("a", "b")], ["id_a", "id_b"])
    with pytest.raises(ValueError, match="N == 0"):
        pagerank(empty, edges)
    dup_nodes = spark.createDataFrame(
        [("a",), ("b",), ("a",), ("b",), ("c",)], ["id"])
    uniq_nodes = spark.createDataFrame([("a",), ("b",), ("c",)], ["id"])
    got = {r["id"]: r["pagerank"]
           for r in pagerank(dup_nodes, edges, n_iters=2).collect()}
    want = {r["id"]: r["pagerank"]
            for r in pagerank(uniq_nodes, edges, n_iters=2).collect()}
    assert got == want and len(got) == 3


def test_local_equals_distributed(spark):
    """r14: the bounded driver-local union-find fast path must produce
    the identical (id, comp) labeling as both distributed loops, on
    random graphs including multi-component, duplicate and reversed
    edges."""
    import random

    from dump1090_db_stream_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    for seed, n, m in [(7, 30, 15), (8, 40, 60), (9, 12, 50)]:
        rng = random.Random(seed)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        pairs = [(a, b) for a, b in pairs if a != b]
        dist = sorted(map(tuple, connected_components(
            _edges(spark, pairs), max_iterations=60,
            local_threshold=0).collect()))
        loc = sorted(map(tuple, connected_components(
            _edges(spark, pairs)).collect()))  # default threshold: local
        loc_star = sorted(map(tuple, connected_components_star(
            _edges(spark, pairs)).collect()))  # local via star entry
        assert loc == dist, f"seed={seed}"
        assert loc_star == dist, f"seed={seed}"


def test_local_path_taken_under_threshold(spark):
    """The fast path must not leave pins behind and must report zero
    star rounds (the observability hook)."""
    from dump1090_db_stream_spark import release_tracked
    from dump1090_db_stream_spark.operators.graph import (
        connected_components_star,
    )

    release_tracked()
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    rounds: list[int] = []
    comp = {r["id"]: r["comp"] for r in connected_components_star(
        _edges(spark, [(i, i + 1) for i in range(20)]),
        rounds_out=rounds).collect()}
    assert set(comp.values()) == {0} and len(comp) == 21
    assert rounds == [0]
    release_tracked()
    assert jsc.getPersistentRDDs().size() == base

"""Approximate string self-join: all pairs within edit distance <= k.

Entity-resolution primitive for training-data pipelines (merging
near-identical titles/names/URLs before dedup keys exist). The naive
form is an O(n^2) cross join with levenshtein() — a non-starter at any
scale. This module implements the q-gram PREFIX-FILTER join (Gravano et
al. VLDB'01 count filtering; Xiao et al. VLDB'08 "Ed-Join" prefix
principle — both public literature):

1. Each string s yields its multiset of overlapping q-grams, numbered
   per-occurrence: elements (gram, occ). |G(s)| = len(s) - q + 1.
2. One edit operation changes at most q of those elements, so
   ed(s, t) <= k  ==>  |G(s) \\ G(t)| <= k*q (multiset difference).
3. Order every (gram, occ) element by a GLOBAL total order (ascending
   corpus frequency, then gram, then occ). Let x* be the smallest
   common element of G(s) and G(t). Every element of G(s) ranked below
   x* lies in G(s) \\ G(t) — at most k*q of them — so x* sits within
   the first k*q + 1 elements of BOTH strings' orderings. Indexing
   only that PREFIX therefore misses no qualifying pair, while skewed
   stop-grams ("er", "an") almost never appear in prefixes because the
   ordering puts RARE grams first — the skew resistance that a plain
   gram inverted index (and this repo's n-gram Jaccard join, which
   needs max_df capping) lacks.
4. Candidates sharing a prefix element, passing the length filter
   ||s|-|t|| <= k, are verified with the built-in JVM levenshtein().

Shuffle shape at 100 TB: gram frequencies are a map-side-combined
aggregate broadcast back; the index carries only k*q + 1 rows per
string (each with the short string itself — cheaper than two join-backs
to recover the pair's strings); the equi-join on (gram, occ) is a hash
join, never a cross product. Verification cost is |candidates|, which
the prefix filter keeps near |true pairs|.

Blind spot handled explicitly: the prefix guarantee needs
|G(s)| > k*q, i.e. len > k*q + q - 1. Shorter strings can be within
distance k yet share zero grams ("ab" vs "cd", q=2, k=2), so they are
routed through a broadcast brute-force pass against every
length-compatible string. Contract: the short bucket is tiny (names
shorter than a few characters); it is broadcast, never shuffled.

Tuning: candidate volume is governed by GRAM DIVERSITY. Over a small
effective alphabet (zero-padded numeric ids: 100 possible digit
bigrams) even the rarest q=2 grams land in buckets of n/100-scale and
candidates blow up ~40x past the true pairs (measured: 9.7M candidates
for 262k pairs on 15k synthetic names). Raise q so alphabet^q far
exceeds n (q=3 cut candidates 13x there); the short-string floor
rises accordingly. CAVEAT (bench fuzzy_candidate_volume, 15k
Customer# names): raising q only helps when the extra gram positions
ADD diversity — on uniform-PREFIX keys whose variation sits in a
short numeric tail, q=4 grams are as concentrated as q=3 while the
prefix grows to k*q+1 = 5 slots, and the measured bound got ~7x WORSE
(739x rows at q=3 vs 5209x at q=4). For such keys the real remedies
are a longer varying tail in the join key or blocking on an
additional column; the guard exists to surface exactly this before
the join runs. Candidate volume also grows superlinearly with n on
low-diversity keys (521x at 1.5k rows -> 739x at 15k, same q=3) —
the round-over-round bench entry tracks that drift. Position-band residuals (classic Ed-Join) would
prune further but are UNSOUND under this module's (gram, occ) multiset
matching — an edit that destroys an early occurrence renumbers later
ones, so matched occurrence pairs can sit k positions apart yet the
minimal common element gets dislocated arbitrarily; see
test_properties.test_edit_distance_join_equals_brute_force for the
losslessness gate any change here must keep green.

The contract query's DuckDB oracle is a full O(n^2) levenshtein cross
join — so the driver hash-check PROVES the prefix filter loses no pair
(same oracle pattern as the decontamination queries).

Reference parity note: the reference repo has no string-similarity
surface at all (SURVEY.md §2.10); this is part of the LLM-pipeline
extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def qgram_elements(df: DataFrame, id_col: str, str_col: str,
                   q: int = 2) -> DataFrame:
    """(id, str, len, gram, occ): the per-occurrence q-gram multiset.

    occ numbers duplicate grams 1..count within each string, making the
    multiset a plain set of (gram, occ) pairs — so multiset intersection
    becomes an equi-join and the prefix-filter set argument applies
    verbatim.
    """
    # two-step projection: the rename must not shadow the source column
    # (input literally named "s" would otherwise become a lateral column
    # alias reference inside the explode lambda)
    base = df.select(F.col(id_col).alias("id"),
                     F.col(str_col).alias("s"),
                     F.length(str_col).alias("slen"))
    grams = base.select(
        "id", "s", "slen",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.lit(1), F.col("slen") - (q - 1))),
                lambda i: F.col("s").substr(i, F.lit(q)),
            )
        ).alias("gram"),
    )
    # occ only needs to label duplicates 1..count; every row in the
    # (id, gram) partition is identical, so any deterministic order works
    # (nondeterministic expressions are illegal in a window orderBy).
    occ = Window.partitionBy("id", "gram").orderBy("slen")
    return grams.withColumn("occ", F.row_number().over(occ))


def _prefix_relation(df: DataFrame, id_col: str, str_col: str,
                     k: int, q: int) -> DataFrame:
    """The frequency-ordered prefix index (id, s, slen, gram, occ) —
    the single definition shared by :func:`edit_distance_join`, its
    candidate-volume guard, and :func:`estimate_candidate_pairs`, so
    the benched estimate can never drift from what the join executes."""
    short_max = k * q + q - 1
    elems = qgram_elements(df, id_col, str_col, q=q).filter(
        F.col("slen") > short_max)
    # Global gram frequency = the total order that puts rare grams in
    # prefixes. Small relation (gram universe), broadcast back.
    freq = elems.groupBy("gram").agg(F.count(F.lit(1)).alias("gfreq"))
    prefix_w = (Window.partitionBy("id")
                .orderBy("gfreq", "gram", "occ"))
    return (elems.join(F.broadcast(freq), "gram")
            .withColumn("rn", F.row_number().over(prefix_w))
            .filter(F.col("rn") <= k * q + 1)
            .select("id", "s", "slen", "gram", "occ"))


def _estimate_from_prefix(prefix: DataFrame) -> tuple[int, int]:
    """(n_long_rows, est_candidate_pairs) from a prefix relation: the
    exact upper bound on expansion-join output is the sum over
    (gram, occ) buckets of c*(c-1)/2. Two small jobs over ``prefix``
    (persist it first — both the guard and the join reuse it)."""
    n_rows = prefix.select("id").distinct().count()
    est_row = (prefix.groupBy("gram", "occ")
               .agg(F.count(F.lit(1)).alias("c"))
               .agg(F.sum((F.col("c") * (F.col("c") - F.lit(1)) / 2)
                          .cast("double")).alias("est"))
               .collect()[0])
    return n_rows, int(est_row["est"] or 0)


def estimate_candidate_pairs(df: DataFrame, id_col: str, str_col: str,
                             k: int = 1, q: int = 2) -> tuple[int, int]:
    """Standalone candidate-volume probe: (long-string rows, candidate
    pair bound) for the given (k, q) — what the in-join guard measures,
    exposed for capacity planning and the bench's round-over-round
    drift record. Persists the prefix internally; caller releases via
    cache.release_tracked (the operator-intermediate contract)."""
    from dump1090_db_stream_spark.cache import track

    return _estimate_from_prefix(
        track(_prefix_relation(df, id_col, str_col, k, q)))


def _deletion_variants(s, k: int):
    """array<string> of all distinct strings reachable from ``s`` by at
    most ``k`` character deletions (including ``s`` itself), as one
    Catalyst expression. k is 1 or 2."""
    def dels(col):
        # all single-deletion variants of `col`
        return F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(col))),
            lambda i: F.concat(
                col.substr(F.lit(1), (i - F.lit(1)).cast("int")),
                col.substr((i + F.lit(1)).cast("int"),
                           F.length(col))))

    d1 = F.concat(F.array(s), F.when(F.length(s) > 0, dels(s))
                  .otherwise(F.array()))
    if k == 1:
        return F.array_distinct(d1)
    # k == 2: one more deletion layer over every 1-deletion variant
    d2 = F.flatten(F.transform(
        d1, lambda v: F.when(F.length(v) > 0, dels(v))
        .otherwise(F.array())))
    return F.array_distinct(F.concat(d1, d2))


def deletion_neighborhood_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 1,
) -> DataFrame:
    """All pairs (id1 < id2) with levenshtein(s1, s2) <= k via the
    DELETION-NEIGHBORHOOD blocking (the SymSpell principle, public:
    Garbe's symmetric delete algorithm): ed(s, t) <= k implies the
    <=k-deletion variant sets of s and t intersect (delete from each
    side the characters an optimal alignment substitutes/inserts — at
    most k per side — and both reduce to the alignment's common
    subsequence). Candidates = pairs sharing a variant; every
    candidate is then VERIFIED with the thresholded built-in
    levenshtein, so the output is exactly the <=k pairs — the same
    contract (and the same brute-force-equality test) as the q-gram
    prefix path.

    Why it exists next to the prefix filter: on LOW-DIVERSITY keys
    (zero-padded numeric tails — the measured 739x candidate blowup at
    q=3 on Customer# names) even rare q-grams concentrate, while a
    shared deletion variant pins agreement on every OTHER character
    position, so candidate volume stays near the true-pair volume.
    The price is a wider index — L+1 variants of ~L bytes per string
    for k=1 (vs k*q+1 prefix rows) — so the prefix path remains the
    default for k > 2 and gram-diverse corpora; this path requires
    k <= 2 (variant count is C(L,2)-quadratic at k=2 and explodes
    beyond).

    Scale shape: one map-side variant explode, one equi-join on the
    variant string, per-candidate thresholded levenshtein, distinct on
    surviving pairs. No short-string fallback needed: the empty string
    is its own variant, so length-0/1 strings participate in the same
    equi-join. Skew: a hot variant bucket of size c means c mutually
    near-identical strings (a true dense cluster) — cost proportional
    to real output, the same class as the prefix path's dense-cluster
    cost."""
    if k not in (1, 2):
        raise ValueError(
            f"deletion_neighborhood_join supports k in (1, 2), got {k}")
    base = df.select(F.col(id_col).alias("id"),
                     F.col(str_col).alias("s"))
    from dump1090_db_stream_spark.cache import track

    # variants feed both self-join sides — persist, or the explode
    # pipeline runs twice (no CSE across self-join branches)
    var = track(base.select(
        "id", "s",
        F.explode(_deletion_variants(F.col("s"), k)).alias("v")))
    # spread the expansion join exactly like the prefix path: the
    # variant relation is small enough for AQE to coalesce to ~1
    # partition, but the join EXPANDS inside hot variant buckets
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = var.repartition(n_part, "v").alias("a")
    b = var.repartition(n_part, "v").alias("b")
    cands = (a.join(b, ["v"])
             .filter(F.col("a.id") < F.col("b.id"))
             .filter(F.abs(F.length("a.s") - F.length("b.s")) <= k)
             .select(F.col("a.id").alias("id1"),
                     F.col("b.id").alias("id2"),
                     F.col("a.s").alias("s1"),
                     F.col("b.s").alias("s2")))
    return (cands.withColumn("dist", F.levenshtein("s1", "s2", k))
            .filter(F.col("dist") >= 0)
            .distinct())


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 1,
    q: int = 2,
    max_candidate_ratio: float | None = 256.0,
    on_exceed: str = "warn",
    method: str = "prefix",
) -> DataFrame:
    """All pairs (id1 < id2) with levenshtein(s1, s2) <= k.

    Output: id1, id2, s1, s2, dist. See module docstring for the
    algorithm and its no-lost-pair argument.

    ``method``: "prefix" (default — the q-gram prefix filter below) or
    "deletions" (k <= 2 only — :func:`deletion_neighborhood_join`, the
    right choice for low-gram-diversity keys where the prefix filter's
    candidate volume detonates; same verified output either way).

    CANDIDATE-VOLUME GUARDRAIL (enforcing the module docstring's
    q-tuning note): before the expansion join runs, the exact upper
    bound on generated candidate pairs — sum over (gram, occ) prefix
    buckets of c*(c-1)/2 — is computed from the (already persisted)
    prefix relation: one gram-universe-sized aggregate, NOT a dry run
    of the join. If the bound exceeds ``max_candidate_ratio`` x input
    rows, ``on_exceed`` decides: "warn" (default) emits a warning with
    the measured ratio and the raise-q remedy; "raise" fails fast —
    use it in pipelines where a low-alphabet key (zero-padded ids)
    could otherwise detonate the verify stage. ``None`` disables the
    check (and its two small jobs). The short-string brute-force
    bucket is outside the estimate: it is tiny by contract and
    broadcast, never the blowup source — so the guard's ratio
    denominator is the LONG-string row count (read off the persisted
    prefix itself, never a rescan of the input lineage).
    """
    import warnings

    from dump1090_db_stream_spark.cache import track

    if on_exceed not in ("warn", "raise"):
        raise ValueError(
            f"on_exceed must be 'warn' or 'raise', got {on_exceed!r}")
    if method not in ("prefix", "deletions"):
        raise ValueError(
            f"method must be 'prefix' or 'deletions', got {method!r}")
    if method == "deletions":
        # identical output contract, different blocking (see
        # deletion_neighborhood_join) — the candidate-volume guard is
        # prefix-specific and does not apply (deletion buckets are
        # bounded by true near-cluster density, not gram diversity)
        return deletion_neighborhood_join(df, id_col, str_col, k)

    # |G| = len - q + 1 <= k*q  <=>  len <= k*q + q - 1: below this the
    # prefix guarantee can fail (A\B may be all of A), so brute-force
    short_max = k * q + q - 1
    base = df.select(F.col(id_col).alias("id"),
                     F.col(str_col).alias("s"),
                     F.length(str_col).alias("slen"))

    # prefix feeds both self-join sides — persist or the tokenize/
    # window pipeline runs twice (no CSE across self-join branches)
    prefix = track(_prefix_relation(df, id_col, str_col, k, q))
    if max_candidate_ratio is not None:
        n_rows, est = _estimate_from_prefix(prefix)
        limit = max_candidate_ratio * max(n_rows, 1)
        if est > limit:
            msg = (
                f"edit_distance_join candidate-volume guard: prefix "
                f"buckets generate up to {est:,} candidate pairs for "
                f"{n_rows:,} long-string rows "
                f"({est / max(n_rows, 1):.0f}x > "
                f"allowed {max_candidate_ratio:.0f}x). Gram diversity "
                f"is too low for q={q} — raise q so alphabet^q far "
                f"exceeds n (see module docstring: q=3 cut a measured "
                f"40x blowup 13x), or raise max_candidate_ratio / pass "
                f"None to accept the verify cost.")
            if on_exceed == "raise":
                raise ValueError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    # EXPLICIT repartition on the join key: the index input is small
    # (k*q+1 rows/string), so AQE would coalesce the exchange to ~1
    # partition — but this join EXPANDS (bucket products), and the
    # expansion then runs serially. A user-specified repartition is
    # exempt from AQE coalescing, keeping the expansion + verify spread
    # across the cluster. (Measured 12x at sf0.1: 51 s -> 4 s.)
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = prefix.repartition(n_part, "gram", "occ").alias("a")
    b = prefix.repartition(n_part, "gram", "occ").alias("b")
    # NO distinct here: a pair can match on several prefix elements, but
    # deduping 10^6-scale candidate rows costs a full-width exchange,
    # while the thresholded levenshtein verify is a few us/row — verify
    # first, dedup the (much smaller) surviving pairs at the end.
    long_pairs = (
        a.join(b, ["gram", "occ"])
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(F.abs(F.col("a.slen") - F.col("b.slen")) <= k)
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"),
                F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
    )

    # Short-string fallback: broadcast the (tiny-by-contract) short
    # bucket against every length-compatible string; id1 < id2 keeps
    # each pair once even when both sides are short.
    shorts = base.filter(F.col("slen") <= short_max)
    partners = base.filter(F.col("slen") <= short_max + k)
    short_pairs = (
        F.broadcast(shorts.alias("a"))
        .join(partners.alias("b"),
              (F.col("a.id") < F.col("b.id"))
              & (F.abs(F.col("a.slen") - F.col("b.slen")) <= k))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"),
                F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
    )
    # ...and symmetrically where the SHORT side has the larger id.
    short_pairs_rev = (
        F.broadcast(shorts.alias("a"))
        .join(partners.alias("b"),
              (F.col("b.id") < F.col("a.id"))
              & (F.abs(F.col("a.slen") - F.col("b.slen")) <= k)
              & (F.col("b.slen") > short_max))
        .select(F.col("b.id").alias("id1"), F.col("a.id").alias("id2"),
                F.col("b.s").alias("s1"), F.col("a.s").alias("s2"))
    )

    cands = long_pairs.unionByName(short_pairs).unionByName(short_pairs_rev)
    # thresholded levenshtein: banded DP + early exit, ~2x over the full
    # distance; returns -1 above the threshold, the true distance below
    return (
        cands.withColumn("dist", F.levenshtein("s1", "s2", k))
        .filter(F.col("dist") >= 0)
        .distinct()
    )

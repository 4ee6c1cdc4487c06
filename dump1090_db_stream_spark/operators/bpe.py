r"""Distributed byte-pair-encoding (BPE) vocabulary training.

Extends the engine's tokenizer story (SURVEY.md §2.10 has no reference
counterpart — the reference, ``dump1090-postgres.py``, has no text
surface at all) from *using* tokenizers (the ``text.with_tokens`` seam)
to *learning* one: the Sennrich et al. 2016 subword-vocabulary trainer
("Neural Machine Translation of Rare Words with Subword Units", ACL),
the algorithm behind GPT-2/RoBERTa-class vocabularies.

Scale design — why this survives 100 TB
---------------------------------------
The classic BPE trainer is sequential, but its *data access* is not:

1. The corpus collapses ONCE into the word-type relation
   ``(word, freq)`` — one shuffle over the corpus, after which every
   training iteration runs over a VOCABULARY-sized relation (tens of
   millions of rows at web scale, not tens of billions).  This is the
   same corpus-collapsing discipline as ``sampling.unimax_allocation``.
2. Each merge iteration is: one map-side pair expansion + one
   vocabulary-sized aggregation + a ONE-ROW argmax collect (bounded by
   construction — the documented bounded-collect pattern, cf. the IVF
   quantizer sampling in ``operators.similarity``).
3. Applying a merge is a pure projection (an ``aggregate`` fold over
   each word's symbol array) — no shuffle, no Python.  The iteration-k
   word table is rebuilt declaratively from the persisted word-type
   base by folding the k learned merges, so no intermediate caching
   accumulates and lineage stays one projection deep.
4. Encoding with a TRAINED merge list is fully declarative: the merges
   are literals, so :func:`encode_words` is a single whole-stage-codegen
   projection chain — the 100 TB encode pass is embarrassingly
   parallel with zero Python.

Greedy-merge semantics (both engines, proven equivalent)
--------------------------------------------------------
A merge of pair ``(a, b)`` applies left-to-right, non-overlapping — the
reference semantics of Sennrich's ``learn_bpe``.  Spark implements it
as a left fold (``aggregate``): append the symbol unless the
accumulator's last element is ``a`` and the symbol is ``b``, in which
case replace the last element with ``a||b``.  A merged token can never
immediately re-merge (``a||b = a`` would need ``b = ''``), so the fold
IS the greedy scan.  The DuckDB oracle replays the same semantics
positionally: match positions form runs only when ``a = b`` (if
positions i and i+1 both match, ``sym[i+1]`` is both ``b`` and ``a``),
and the greedy scan keeps exactly the odd-ranked (1st, 3rd, ...)
positions of each run — a window expression.  Pair COUNTING includes
overlapping occurrences ("aaa" counts (a,a) twice), again matching the
reference implementation's ``get_stats``.

Tie-breaking is total and engine-portable: highest count, then
``(lhs, rhs)`` ascending — Spark's UTF8_BINARY and DuckDB's default
BINARY collation compare UTF-8 bytes identically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import with_tokens


def word_freqs(df: DataFrame, text_col: str = "text",
               tokenizer="word", min_freq: int = 1) -> DataFrame:
    """The corpus-collapsing step: distinct words with frequencies.

    One corpus scan + one vocabulary-sized aggregation; every BPE
    iteration afterwards touches only this relation.  ``tokenizer``
    goes through the :func:`text.make_tokenizer` seam (default: the
    unicode-category word splitter — the oracle-portable choice).
    ``min_freq`` prunes the long hapax tail, the standard way to cut
    the type table an order of magnitude at web scale (documented
    knob; the contract queries keep it at 1 so the oracle replays the
    full table).
    """
    toked = with_tokens(df.filter(F.col(text_col).isNotNull()),
                        text_col, "_toks", tokenizer)
    out = (toked.select(F.explode("_toks").alias("word"))
           .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    if min_freq > 1:
        out = out.filter(F.col("freq") >= min_freq)
    return out


def with_symbols(words: DataFrame, word_col: str = "word",
                 syms_col: str = "syms") -> DataFrame:
    """Initial symbol sequences: one character per symbol.

    ``split(word, '')`` yields one array element per codepoint — the
    same decomposition as DuckDB's ``string_split(word, '')``, verified
    on non-ASCII input (prototyped: 'café' -> [c,a,f,é] in both).
    """
    return words.withColumn(syms_col, F.split(F.col(word_col), ""))


def adjacent_pair_counts(words: DataFrame, syms_col: str = "syms",
                         freq_col: str = "freq") -> DataFrame:
    """Corpus-weighted adjacent-symbol pair counts ``(l, r, cnt)``.

    Overlapping occurrences count (Sennrich ``get_stats`` semantics).
    Map-side expansion (zip_with of two slices — no index arithmetic
    that could desync between engines) + one vocabulary-sized
    aggregation.  Words of a single symbol contribute nothing (both
    slices are empty); the ``greatest(..., 0)`` clamp keeps an empty
    symbol array (reachable only through the train_bpe_from_words
    caller seam) from handing slice() a negative length (r12 ADVICE).
    """
    syms = F.col(syms_col)
    n = F.greatest(F.size(syms) - F.lit(1), F.lit(0))
    pairs = F.zip_with(
        F.slice(syms, F.lit(1), n),
        F.slice(syms, F.lit(2), n),
        lambda l, r: F.struct(l.alias("l"), r.alias("r")))
    return (words.select(F.col(freq_col), F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum(freq_col).cast("long").alias("cnt")))


def merge_fold(syms: Column, lhs: str, rhs: str) -> Column:
    """The greedy left-to-right non-overlapping merge as a left fold.

    See the module docstring for the equivalence argument with the
    oracle's positional (run-parity) formulation.
    """
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (s == F.lit(rhs)),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(F.lit(lhs + rhs)))
        ).otherwise(F.concat(acc, F.array(s))))


def encode_words(words: DataFrame, merges: Sequence[dict],
                 syms_col: str = "syms") -> DataFrame:
    """Apply a trained merge list to the word-type table.

    The merges are literals, so this is ONE projection chain (Catalyst
    collapses the per-merge withColumns) — the fully-declarative encode
    path a 100 TB corpus pass needs: no Python, no shuffle, no state.
    """
    col = F.col(syms_col)
    for m in merges:
        col = merge_fold(col, m["lhs"], m["rhs"])
    return words.withColumn(syms_col, col)


def train_bpe(df: DataFrame, n_merges: int, text_col: str = "text",
              tokenizer="word", min_freq: int = 1) -> list[dict]:
    """Learn ``n_merges`` BPE merges from a corpus.

    Returns the ordered merge table: dicts with ``merge_rank``,
    ``lhs``, ``rhs``, ``merged``, ``pair_count``.  Stops early if the
    symbol-pair table empties (every word fully merged).

    Driver loop shape (the honest cost of BPE's sequential argmax):
    ``n_merges`` jobs, each re-folding the k learned merges over the
    PERSISTED word-type base (vocabulary-sized; the corpus is touched
    exactly once, in :func:`word_freqs`) and collecting ONE row.  No
    intermediate is cached beyond the base, so repeated training runs
    leave no storage residue.
    """
    base = with_symbols(word_freqs(df, text_col, tokenizer, min_freq))
    base = base.persist()
    try:
        merges: list[dict] = []
        for k in range(n_merges):
            words = encode_words(base, merges)
            top = (adjacent_pair_counts(words)
                   .orderBy(F.col("cnt").desc(), F.col("l").asc(),
                            F.col("r").asc())
                   .limit(1).collect())  # bounded: exactly one row
            if not top:
                break
            l, r, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
            merges.append({"merge_rank": k, "lhs": l, "rhs": r,
                           "merged": l + r, "pair_count": int(cnt)})
        return merges
    finally:
        base.unpersist(blocking=False)


def has_adjacent_pair(syms: Column, lhs: str, rhs: str) -> Column:
    """Predicate: the symbol sequence contains ``(lhs, rhs)`` adjacent —
    the same zip-of-slices pair enumeration as
    :func:`adjacent_pair_counts`, so the affected-word filter and the
    pair counter can never disagree about what "contains the pair"
    means. Slice lengths clamp at 0: ``size - 1`` is negative for an
    empty symbol array and Spark's ``slice()`` raises on negative
    lengths — unreachable through word_freqs (which never emits empty
    words) but :func:`train_bpe_from_words` exposes the (word, freq,
    syms) relation as a caller seam (r12 ADVICE)."""
    n = F.greatest(F.size(syms) - F.lit(1), F.lit(0))
    pairs = F.zip_with(
        F.slice(syms, F.lit(1), n),
        F.slice(syms, F.lit(2), n),
        lambda l, r: (l == F.lit(lhs)) & (r == F.lit(rhs)))
    return F.exists(pairs, lambda hit: hit)


def train_bpe_incremental(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    tokenizer="word",
    min_freq: int = 1,
    checkpoint_every: int = 8,
) -> list[dict]:
    """:func:`train_bpe` with the standard Sennrich pair-delta
    optimization — the parameter-scale path (r11 verdict ask #2): the
    per-iteration cost is proportional to the words CONTAINING the
    just-merged pair, not to the whole vocabulary, and nothing in the
    loop ever re-folds the full merge history.

    Maintained state (both vocabulary-bounded, refreshed in place):

    - ``words``  — the current ``(word, freq, syms)`` symbol table;
    - ``counts`` — the current adjacent-pair counts ``(l, r, cnt)``.

    Each iteration: (1) ONE-ROW argmax collect over ``counts`` (a
    pair-vocabulary relation — far smaller than the word table);
    (2) the pair-count delta — new minus old adjacent pairs of only
    the words CONTAINING the merged pair (:func:`has_adjacent_pair`) —
    as one explode-aggregate, merged into ``counts`` by a bounded
    union-groupBy; (3) the words update as one conditional
    SINGLE-merge fold projection (never a k-deep chain). Each state
    relation is referenced exactly ONCE per iteration — a filter/union
    two-branch update would double the uncheckpointed plan tree every
    iteration. All arithmetic is exact integers, so after k iterations
    ``counts`` is bit-identical to recounting from scratch (the
    equivalence test pins this against :func:`train_bpe`).

    Lineage discipline: the iterative state would otherwise grow a
    plan O(k) deep (the r11 verdict's O(K²) fold-chain critique).
    ``counts`` is eagerly ``localCheckpoint``-ed EVERY iteration — its
    update is a shuffle, and chaining shuffles between checkpoints
    makes every argmax re-execute the whole nested chain (measured
    4+ s/iteration at cadence 8 vs ~0.5 s materialized). ``words`` is
    narrow (conditional fold projections), so it materializes only
    every ``checkpoint_every`` iterations. Lineage depth stays bounded
    by a constant regardless of ``n_merges``; superseded checkpoints
    are unpersisted as soon as their successor exists. On a real
    cluster ``localCheckpoint`` trades executor-loss recomputability
    for speed — the right trade for a bounded training loop whose
    restart cost is one rerun (same trade the similarity quantizer
    training documents).

    Returns the identical merge-table dicts as :func:`train_bpe`; stops
    early when no adjacent pair remains.
    """
    base = with_symbols(word_freqs(df, text_col, tokenizer, min_freq))
    return train_bpe_from_words(base, n_merges,
                                checkpoint_every=checkpoint_every)


def train_bpe_from_words(
    base: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
) -> list[dict]:
    """:func:`train_bpe_incremental`'s training loop over an
    already-built ``(word, freq, syms)`` relation — the seam for
    callers that own the word-type table (pre-tokenized corpora, the
    scaling bench's synthetic vocabularies)."""
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}")
    from dump1090_db_stream_spark.cache import release_local_checkpoint

    words = base.localCheckpoint(eager=True)
    counts = adjacent_pair_counts(words).localCheckpoint(eager=True)
    words_pin, counts_pin = words, counts   # latest checkpoints held

    def _signed_pairs(syms: Column, sign: int) -> Column:
        # array of (l, r, cnt) contribution structs for one side of
        # the delta — built as an EXPRESSION so the whole delta is one
        # projection over the affected rows (each state relation is
        # referenced exactly ONCE per iteration: a second reference
        # would double the uncheckpointed plan tree every iteration).
        # greatest(..., 0): slice() raises on the negative length an
        # empty syms array would produce (caller-seam guard, r12
        # ADVICE — same clamp as has_adjacent_pair).
        n = F.greatest(F.size(syms) - F.lit(1), F.lit(0))
        return F.zip_with(
            F.slice(syms, F.lit(1), n),
            F.slice(syms, F.lit(2), n),
            lambda l, r: F.struct(
                l.alias("l"), r.alias("r"),
                (F.col("freq") * sign).cast("long").alias("cnt")))

    try:
        merges: list[dict] = []
        for k in range(n_merges):
            top = (counts.filter(F.col("cnt") > 0)
                   .orderBy(F.col("cnt").desc(), F.col("l").asc(),
                            F.col("r").asc())
                   .limit(1).collect())  # bounded: exactly one row
            if not top:
                break
            l, r, cnt = top[0]["l"], top[0]["r"], top[0]["cnt"]
            merges.append({"merge_rank": k, "lhs": l, "rhs": r,
                           "merged": l + r, "pair_count": int(cnt)})

            hit = has_adjacent_pair(F.col("syms"), l, r)
            old_s, new_s = F.col("syms"), F.col("_new")
            # pair-count delta: only words CONTAINING the merged pair
            # contribute — new pairs positive, old pairs negative, one
            # explode-aggregate over the affected slice
            delta = (words.filter(hit)
                     .withColumn("_new", merge_fold(old_s, l, r))
                     .select(F.explode(F.concat(
                         _signed_pairs(new_s, 1),
                         _signed_pairs(old_s, -1))).alias("p"))
                     .select("p.l", "p.r", "p.cnt"))
            # counts checkpoint EVERY iteration: the update is a
            # SHUFFLE (union + groupBy), and chaining shuffles between
            # checkpoints makes every argmax re-execute the whole
            # nested chain — measured 4+ s/iteration at cadence 8 vs
            # ~0.5 s with per-iteration materialization. The words
            # chain is narrow (conditional fold projections), so it
            # only materializes every ``checkpoint_every`` iterations.
            new_counts = (counts.unionByName(delta)
                          .groupBy("l", "r")
                          .agg(F.sum("cnt").cast("long").alias("cnt"))
                          .filter(F.col("cnt") != 0)
                          .localCheckpoint(eager=True))
            release_local_checkpoint(counts_pin)
            counts_pin = new_counts
            # single-reference update: ONE single-merge fold projection.
            # merge_fold is already the identity on words not containing
            # the pair, so no when(hit, ...) wrapper — a wrapper would
            # reference the previous layer's syms 3-4x and Catalyst's
            # project collapsing then grows the inlined expression tree
            # ~4^depth between checkpoints (measured: minutes/iteration);
            # the bare fold references it ONCE, so chains stay linear
            # exactly like encode_words' fold chain.
            new_words = words.withColumn(
                "syms", merge_fold(old_s, l, r))
            if (k + 1) % checkpoint_every == 0 or k == n_merges - 1:
                new_words = new_words.localCheckpoint(eager=True)
                release_local_checkpoint(words_pin)
                words_pin = new_words
            words, counts = new_words, new_counts
        return merges
    finally:
        # checkpoint RDD blocks are invisible to DataFrame.unpersist()
        # — only the explicit RDD-level release frees them (the
        # test_cache residue contract)
        release_local_checkpoint(words_pin)
        release_local_checkpoint(counts_pin)


def encode_words_chunked(words: DataFrame, merges: Sequence[dict],
                         syms_col: str = "syms",
                         chunk: int = 16) -> DataFrame:
    """:func:`encode_words` for merge lists past the fold-chain limit
    (r11 verdict ask #2's encode half): a 32k-merge vocabulary as ONE
    projection would build a 32k-deep ``aggregate`` lambda chain that
    breaks Catalyst analysis long before execution, so the merges apply
    in ``chunk``-sized batches with an eager ``localCheckpoint``
    between batches — every materialized intermediate is a plan only
    ``chunk`` folds deep, and total work stays one pass per chunk over
    the vocabulary-sized relation (never the corpus). Bit-identical to
    :func:`encode_words` (batching a left fold preserves it)."""
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    merges = list(merges)
    if len(merges) <= chunk:
        return encode_words(words, merges, syms_col)
    from dump1090_db_stream_spark.cache import (
        register_for_release,
        release_local_checkpoint,
    )

    out = words
    prev = None
    for i in range(0, len(merges), chunk):
        out = encode_words(out, merges[i:i + chunk], syms_col)
        if i + chunk < len(merges):
            out = out.localCheckpoint(eager=True)
            if prev is not None:
                release_local_checkpoint(prev)
            prev = out
    if prev is not None:
        # the returned frame still reads through the LAST checkpoint —
        # register it so the caller's release_tracked() (the bench /
        # foreachBatch discipline) frees its blocks after consuming
        register_for_release(prev)
    return out


def encode_words_arrow(words: DataFrame, merges: Sequence[dict],
                       syms_col: str = "syms") -> DataFrame:
    """Arrow-batched encode kernel for high-K merge lists — the shape a
    real 32k-vocabulary corpus pass uses: the merge list rides to the
    executors ONCE as a captured list (a few MB at 32k entries), and
    each Arrow batch applies the merges in rank order with the same
    greedy left-to-right non-overlapping scan as :func:`merge_fold` —
    Sennrich ``apply_bpe`` semantics, NOT the lowest-rank-first
    priority encode (the two differ on sequences where a later merge's
    output feeds an earlier merge's pattern; equivalence to the
    declarative fold is what the oracle replays). Python is justified
    here (documented Arrow seam, cf. ``operators.multimodal``): the
    per-row work is a data-dependent loop no Column expression can
    express at unbounded K. A per-merge first-symbol index skips merges
    whose lhs is absent, so typical cost is O(tokens x applicable
    merges), not O(tokens x K)."""
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    mlist = [(m["lhs"], m["rhs"]) for m in merges]
    out_schema = words.schema

    def _apply(seq: list) -> list:
        for lhs, rhs in mlist:
            if lhs not in seq:
                continue
            out, i, n = [], 0, len(seq)
            while i < n:
                if i + 1 < n and seq[i] == lhs and seq[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return seq

    def _encode(batches):
        for pdf in batches:
            pdf[syms_col] = pdf[syms_col].map(
                lambda s: _apply(list(s)))
            yield pdf

    return words.mapInPandas(_encode, out_schema)


def train_bpe_local(df: DataFrame, n_merges: int, text_col: str = "text",
                    tokenizer="word", min_freq: int = 1) -> list[dict]:
    """Production-K trainer (r12 verdict ask #4): ONE distributed
    word-type count, then classic fast BPE driver-locally over the
    collected table, leaving the distributed encode passes
    (:func:`encode_words_chunked` / :func:`encode_words_arrow`)
    unchanged.

    Why this is the right 100 TB shape for K in the tens of thousands:
    the corpus collapses once into the vocabulary-bounded ``(word,
    freq, syms)`` relation (tens of millions of rows even at web
    scale — hundreds of MB, the standard escape every production
    tokenizer training takes), and the K-round SEQUENTIAL dependency
    then runs where sequential work is cheap: in-process, with an
    inverted pair->words index and a lazy-invalidation heap, so each
    merge costs O(words containing the pair), not a distributed
    job-scheduling round trip. 32k merges take minutes where the
    distributed loop's per-round ~0.5-1 s scheduling floor alone would
    take hours (BASELINE.md r12 addendum; capability-range gap this
    closes). Bit-identical to :func:`train_bpe_incremental` /
    :func:`train_bpe` — same overlap-counting pair statistics, same
    (count DESC, lhs, rhs) argmax (Python codepoint order == UTF-8
    byte order, both engines' collation), same greedy non-overlapping
    merge — pinned by tests/test_bpe.py at K=64 on the contract
    corpus. ``min_freq`` bounds the collected table exactly like
    :func:`word_freqs` documents."""
    base = with_symbols(word_freqs(df, text_col, tokenizer, min_freq))
    rows = base.select("freq", "syms").collect()  # vocabulary-bounded
    return train_bpe_local_from_words(
        ((r["freq"], r["syms"]) for r in rows), n_merges)


def train_bpe_local_from_words(word_list, n_merges: int) -> list[dict]:
    """:func:`train_bpe_local`'s in-process training loop over
    ``(freq, syms)`` pairs — the seam mirror of
    :func:`train_bpe_from_words` for callers that own the word-type
    table. Maintains exact integer pair counts, an inverted
    pair->word-ids index, and a lazy-invalidation heap for the argmax
    (stale entries are discarded when their count no longer matches);
    per merge, only the words CONTAINING the winning pair are
    re-scanned — the same pair-delta discipline as the distributed
    trainer, so the trajectories are identical by construction."""
    import heapq
    from collections import Counter, defaultdict

    freqs: list[int] = []
    symtab: list[list[str]] = []
    for freq, syms in word_list:
        if syms:
            freqs.append(int(freq))
            symtab.append(list(syms))
    counts: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(symtab):
        f = freqs[i]
        for p in zip(syms, syms[1:]):
            counts[p] += f          # overlaps count (get_stats)
            where[p].add(i)
    heap = [(-c, l, r) for (l, r), c in counts.items() if c > 0]
    heapq.heapify(heap)

    merges: list[dict] = []
    for k in range(n_merges):
        win = None
        while heap:
            negc, l, r = heap[0]
            if counts.get((l, r), 0) == -negc:
                win = (l, r, -negc)   # fresh entry: the true argmax
                break
            heapq.heappop(heap)       # stale — count moved on
        if win is None:
            break                     # no adjacent pair remains
        l, r, cnt = win
        heapq.heappop(heap)
        merges.append({"merge_rank": k, "lhs": l, "rhs": r,
                       "merged": l + r, "pair_count": int(cnt)})
        touched: set[tuple[str, str]] = set()
        for i in sorted(where.get((l, r), ())):
            syms, f = symtab[i], freqs[i]
            out, j, n = [], 0, len(syms)
            while j < n:              # greedy left-to-right scan ==
                if (j + 1 < n         # merge_fold (module docstring)
                        and syms[j] == l and syms[j + 1] == r):
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            symtab[i] = out
            delta = Counter(zip(out, out[1:]))
            delta.subtract(Counter(zip(syms, syms[1:])))
            for p, dc in delta.items():
                if dc == 0:
                    continue
                counts[p] += dc * f
                touched.add(p)
                if dc > 0:
                    where[p].add(i)
            for p in set(zip(syms, syms[1:])) - set(zip(out, out[1:])):
                s = where.get(p)
                if s is not None:
                    s.discard(i)
        for p in touched:
            c = counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
            else:
                counts.pop(p, None)
                where.pop(p, None)
    return merges


def merges_df(spark, merges: Sequence[dict]) -> DataFrame:
    """The merge table as a DataFrame (driver-resident by construction:
    each row is the result of one bounded argmax collect)."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("merge_rank", LongType()),
        StructField("lhs", StringType()),
        StructField("rhs", StringType()),
        StructField("merged", StringType()),
        StructField("pair_count", LongType()),
    ])
    rows = [(m["merge_rank"], m["lhs"], m["rhs"], m["merged"],
             m["pair_count"]) for m in merges]
    return spark.createDataFrame(rows, schema)


def bpe_vocab(df: DataFrame, merges: Sequence[dict],
              text_col: str = "text", tokenizer="word",
              min_freq: int = 1, chunk: int | None = 4) -> DataFrame:
    """Final symbol vocabulary after applying ``merges``: per symbol,
    the corpus-weighted occurrence count and the number of word types
    containing it.  Declarative end to end (fold chain + explode +
    one vocabulary-sized aggregation).  ``chunk`` routes the encode
    through :func:`encode_words_chunked`; the default (4) is
    deliberately SMALLER than a plain encode needs, because the
    explode below pays super-linearly for the residual fold-chain
    depth feeding it (measured r13 at sf0.1, 31 word types: depth 4
    -> 0.5 s, 6 -> 1.5 s, 8 -> 2.0 s, 12 -> 16 s — Generate +
    deep nested ``aggregate`` lambdas blow up planning/codegen where
    the same chain under a plain projection costs 0.5 s). Pass
    ``chunk=None`` only for merge lists short enough to feed the
    explode directly."""
    base = with_symbols(word_freqs(df, text_col, tokenizer, min_freq))
    words = (encode_words_chunked(base, merges, chunk=chunk)
             if chunk else encode_words(base, merges))
    return (words.select("word", "freq", F.explode("syms").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("freq").cast("long").alias("n_occurrences"),
                 F.countDistinct("word").alias("n_word_types")))


def encoded_stats(df: DataFrame, merges: Sequence[dict],
                  text_col: str = "text", group_col: str = "source",
                  tokenizer="word") -> DataFrame:
    """Per-group subword compression report for a trained merge list:
    words, subword tokens, and character mass.

    The per-group word counts join the encoded word-type table on
    ``word`` — both sides vocabulary-sized (per-group types <= types),
    a plain shuffle equi-join; at web scale neither side is
    broadcastable and neither needs to be.
    """
    toked = with_tokens(df.filter(F.col(text_col).isNotNull()),
                        text_col, "_toks", tokenizer)
    grp_words = (toked.select(group_col, F.explode("_toks").alias("word"))
                 .groupBy(group_col, "word")
                 .agg(F.count(F.lit(1)).alias("gfreq")))
    enc = encode_words(with_symbols(word_freqs(df, text_col, tokenizer)),
                       merges).select(
        "word", F.size("syms").alias("n_subwords"),
        F.length("word").alias("n_chars"))
    return (grp_words.join(enc, "word")
            .groupBy(group_col)
            .agg(F.sum("gfreq").cast("long").alias("n_words"),
                 (F.sum(F.col("gfreq") * F.col("n_subwords"))
                  .cast("long").alias("n_subword_tokens")),
                 (F.sum(F.col("gfreq") * F.col("n_chars"))
                  .cast("long").alias("n_word_chars"))))


# --------------------------------------------------------------------
# DuckDB-oracle SQL twins.  The replay derives its own merges (no
# data-dependent literals leak from the Spark side), stage by stage:
# the same word-type base, the same overlap-counting pair aggregation,
# the same (cnt DESC, l, r) argmax, and the run-parity formulation of
# the greedy merge.  MATERIALIZED is load-bearing: each stage references
# its predecessor several times, and CTE inlining would make the unrolled
# plan exponential in n_merges (measured: K=6 inlined did not finish;
# materialized runs in 0.13 s).
# --------------------------------------------------------------------

#: RE2/Java-identical word tokenizer — mirrors text.WORD_TOKEN_RE.
_WORD_RE_SQL = r"[\p{L}\p{N}]+"


def words0_sql(table: str = "documents", text_col: str = "text") -> str:
    """The word-type base CTE body (call it ``words0``)."""
    return f"""
  SELECT word, COUNT(*)::BIGINT AS freq, string_split(word, '') AS syms
  FROM (SELECT unnest(regexp_extract_all({text_col}, '{_WORD_RE_SQL}'))
            AS word
        FROM {table} WHERE {text_col} IS NOT NULL)
  GROUP BY word"""


def stage_sql(k: int) -> str:
    """Merge stage ``k`` (1-based): derives ``best{k}`` (the argmax
    pair) and ``words{k}`` (the merged word table) from
    ``words{k-1}``."""
    return f"""
pos{k} AS MATERIALIZED (
  SELECT word, freq, unnest(syms) AS sym,
         unnest(range(1, len(syms) + 1)) AS pos
  FROM words{k - 1}
),
pr{k} AS MATERIALIZED (
  SELECT a.word, a.freq, a.pos, a.sym AS l, b.sym AS r
  FROM pos{k} a JOIN pos{k} b ON b.word = a.word AND b.pos = a.pos + 1
),
best{k} AS MATERIALIZED (
  SELECT l, r, SUM(freq)::BIGINT AS cnt FROM pr{k} GROUP BY l, r
  ORDER BY cnt DESC, l, r LIMIT 1
),
kp{k} AS MATERIALIZED (
  -- greedy scan = odd-ranked positions of each run of match positions
  SELECT word, pos FROM (
    SELECT word, pos,
           ROW_NUMBER() OVER (PARTITION BY word, grp ORDER BY pos) AS rn
    FROM (SELECT p.word, p.pos,
                 p.pos - ROW_NUMBER() OVER (PARTITION BY p.word
                                            ORDER BY p.pos) AS grp
          FROM pr{k} p, best{k} b WHERE p.l = b.l AND p.r = b.r))
  WHERE rn % 2 = 1
),
words{k} AS MATERIALIZED (
  SELECT p.word, p.freq,
         list(CASE WHEN m.pos IS NOT NULL THEN p.sym || nx.sym
                   ELSE p.sym END ORDER BY p.pos) AS syms
  FROM pos{k} p
  LEFT JOIN kp{k} m  ON m.word = p.word AND m.pos = p.pos
  LEFT JOIN kp{k} d  ON d.word = p.word AND d.pos = p.pos - 1
  LEFT JOIN pos{k} nx ON nx.word = p.word AND nx.pos = p.pos + 1
  WHERE d.pos IS NULL
  GROUP BY p.word, p.freq
)"""


def replay_prefix_sql(n_merges: int, table: str = "documents",
                      text_col: str = "text") -> str:
    """The full unrolled training replay as a WITH prefix: ``words0``
    plus ``n_merges`` stages.  Compose a final SELECT over ``best{k}``
    (the merge table) or ``words{n_merges}`` (the encoded types)."""
    return ("WITH words0 AS MATERIALIZED ("
            + words0_sql(table, text_col) + "\n),"
            + ",".join(stage_sql(k) for k in range(1, n_merges + 1)))


def merges_select_sql(n_merges: int) -> str:
    """Final SELECT for the learned merge table."""
    return ("SELECT * FROM ("
            + " UNION ALL ".join(
                f"SELECT CAST({k - 1} AS BIGINT) AS merge_rank, l AS lhs,"
                f" r AS rhs, l || r AS merged, cnt AS pair_count"
                f" FROM best{k}"
                for k in range(1, n_merges + 1))
            + ")")

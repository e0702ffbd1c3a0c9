"""Distributed BPE tokenizer training (SURVEY.md §2.10 extension axis).

Byte-Pair Encoding merge-rule learning (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016) — the canonical tokenizer-training step of every LLM data
pipeline, re-expressed Spark-first:

  * The corpus collapses to the DISTINCT-WORD table first
    (``word_counts``): pair statistics are identical over
    ``(word, count)`` weights, and at 100 TB the distinct-word table
    is millions of rows where the corpus is trillions — this is the
    standard trick that makes BPE training tractable, and it is also
    exactly the shape Spark wants (one shuffle to build, every
    iteration touches only the vocabulary-sized table).
  * Each learn iteration is ONE weighted pair aggregate (adjacent
    pairs via ``arrays_zip(toks, slice(toks, 2, ...))`` — JVM-side,
    map-side combine) + an O(1) driver argmax (a single
    ``limit(1).collect()`` row, deterministic tie-break: count desc,
    then pair lexicographic) + one merge-application pass over ONLY
    the words containing the winning pair (``F.exists`` prune).
  * Greedy non-overlapping left-to-right merge application is a pure
    Catalyst fold (``F.aggregate`` with an (out, carry) struct
    accumulator — no Python in the loop).  The fold's array-append is
    O(len²) in expression-engine copies; words are ≤ ~30 symbols so
    this is immaterial — and is the reason application happens on the
    distinct-WORD table, never on raw documents.
  * Loop state (the tokenized vocabulary) follows the engine's
    checkpoint discipline: parquet-landed per iteration via
    ``plans/iteration.Materializer``.

Correctness contract: the learn loop is iterative and data-dependent
(each argmax depends on the previous merge), so — like the WCC family
— it carries a PURE-PYTHON differential oracle
(``tests/test_bpe.py::ref_bpe``: the same algorithm in ~20 lines of
driver Python, merges must match exactly) plus an exact SQL oracle
for the stage the gate can replay: the initial weighted pair counts
(``doc_bpe_pair_counts``).  The ``</w>`` end-of-word marker follows
the original paper, so merges distinguish word-final from word-inner
units.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from community_detection_flink_spark.plans.iteration import Materializer

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, n)`` distinct-word weights: lowercased,
    whitespace-split, empties dropped.  The one corpus-sized pass of
    the whole training run."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _char_tokens(word: Column) -> Column:
    """Initial symbol sequence: characters + the ``</w>`` marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _adjacent_pairs(toks: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty for len<2)."""
    return F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )


def _merge_fold(toks: Column, a: str, b: str) -> Column:
    """Greedy non-overlapping left-to-right replacement of the
    adjacent pair (a, b) by its concatenation — the exact BPE
    application rule — as a Catalyst fold with an (out, carry)
    accumulator.  [a,b,a,b,a] with (a,b) → [ab, ab, a]."""
    nul = F.lit(None).cast("string")
    return F.aggregate(
        toks,
        F.struct(
            F.expr("array()").cast("array<string>").alias("out"),
            nul.alias("carry"),
        ),
        lambda acc, x: F.when(
            acc["carry"].isNull(), F.struct(acc["out"].alias("out"), x.alias("carry"))
        )
        .when(
            (acc["carry"] == F.lit(a)) & (x == F.lit(b)),
            F.struct(
                F.concat(acc["out"], F.array(F.lit(a + b))).alias("out"),
                nul.alias("carry"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                x.alias("carry"),
            )
        ),
        lambda acc: F.when(acc["carry"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["carry"]))
        ),
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-pair counts over the initial character
    tokenization: ``(left, right, freq)``.  One explode + one keyed
    aggregate with map-side combine — and the stage with an exact SQL
    oracle (``doc_bpe_pair_counts``)."""
    return (
        words.select("n", F.explode(_adjacent_pairs(_char_tokens(F.col("word")))).alias("p"))
        .groupBy(F.col("p.a").alias("left"), F.col("p.b").alias("right"))
        .agg(F.sum("n").cast("long").alias("freq"))
    )


def _learn_over_vocab(rows, num_merges: int) -> list[tuple[int, str, str, int]]:
    """Driver-local BPE learn with DELTA pair-count maintenance — the
    classic efficient algorithm: a lazy max-heap over pair frequencies
    plus a pair→words occurrence index, so each merge touches only the
    words that actually contain the winning pair and re-ranks in
    O(log #pairs) instead of re-aggregating the whole vocabulary.
    ``rows`` is ``(n, toks)`` — the ALREADY-TOKENIZED vocabulary
    collected from Spark, so character splitting is bit-identical to
    the distributed loop's ``_char_tokens``.  Tie-break matches it
    exactly: freq desc, then (left, right) lexicographic asc."""
    import heapq

    words = [[list(toks), int(n)] for n, toks in rows]
    counts: dict[tuple[str, str], int] = {}
    occ: dict[tuple[str, str], set[int]] = {}
    for wi, (toks, n) in enumerate(words):
        for p in zip(toks, toks[1:]):
            counts[p] = counts.get(p, 0) + n
            occ.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(num_merges)):
        top = None
        while heap:
            negc, p = heapq.heappop(heap)
            # lazy invalidation: every count change pushed a fresh
            # entry, so a mismatch means this one is stale
            if -negc > 0 and counts.get(p, 0) == -negc:
                top = (p, -negc)
                break
        if top is None:
            break
        (a, b), freq = top
        merges.append((rank, a, b, freq))
        ab = a + b
        touched: set[tuple[str, str]] = set()
        # occ is a SUPERSET of the words currently containing (a, b)
        # (entries go stale when a later rewrite removes the pair);
        # the hit test below makes stale visits exact no-ops
        for wi in occ.get((a, b), ()):
            toks, n = words[wi]
            out, i, hit = [], 0, False
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(ab)
                    i += 2
                    hit = True
                else:
                    out.append(toks[i])
                    i += 1
            if not hit:
                continue
            for p in zip(toks, toks[1:]):
                counts[p] -= n
                touched.add(p)
            for p in zip(out, out[1:]):
                counts[p] = counts.get(p, 0) + n
                occ.setdefault(p, set()).add(wi)
                touched.add(p)
            words[wi][0] = out
        occ.pop((a, b), None)
        for p in touched:
            c = counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
            else:
                counts.pop(p, None)
                occ.pop(p, None)
    return merges


def bpe_learn(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    mat: Materializer | None = None,
    strategy: str = "auto",
    local_vocab_limit: int = 4_000_000,
) -> DataFrame:
    """Learn ``num_merges`` BPE merge rules; returns ``(rank, left,
    right, freq)`` with rank the merge order (0-based).  Deterministic:
    ties on frequency break on (left, right) lexicographic — pinned by
    the pure-Python differential oracle in tests/test_bpe.py, which
    both strategies must match exactly.

    ``strategy`` picks the learn loop (VERDICT r11 #3 — the measured
    per-merge job ceiling):

    * ``"distributed"`` — one Spark pair-aggregate + one O(1) argmax
      collect + one merge-application job PER MERGE.  Correct at any
      vocabulary size, but driver-job-bound: MEASURED 0.8–1.0 s/merge
      on the sf0.01 corpus and 2.3 s/merge on a 181k-word synthetic
      vocabulary (SCALING.md r12) — a production 30k-merge tokenizer
      would be ~19 hours of job scheduling regardless of cluster size.
    * ``"local"`` — ONE corpus-sized Spark pass builds the distinct-word
      table (vocabulary-sized by construction: millions of rows where
      the corpus is trillions), which is then collected and learned
      over driver-side with delta pair-count maintenance + a lazy
      max-heap (``_learn_over_vocab``).  MEASURED ~5 ms marginal per
      merge at 181k words (1024 merges in 34.3 s INCLUDING the Spark
      pass and vocab collect, vs 28.3 s for just TEN distributed
      merges) — ~450× per merge, and the scale-CORRECT choice: after
      the one distributed pass the problem is no longer big data.
    * ``"auto"`` (default) — ``"local"`` when the vocabulary row count
      is ≤ ``local_vocab_limit`` (4M words ≈ a few hundred MB of
      driver heap, far above any natural-language vocabulary), else
      ``"distributed"``.
    """
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    spark = docs.sparkSession
    own_mat = mat is None
    mat = mat or Materializer(spark)
    vocab = mat(
        word_counts(docs, text_col).select(
            "n", _char_tokens(F.col("word")).alias("toks")
        ),
        "bpe-vocab",
    )
    if strategy == "auto":
        strategy = (
            "local" if vocab.count() <= int(local_vocab_limit) else "distributed"
        )
    if strategy == "local":
        merges = _learn_over_vocab(
            ((r["n"], r["toks"]) for r in vocab.toLocalIterator()),
            num_merges,
        )
        mat.drop(vocab)
        if own_mat:
            mat.cleanup()
        return spark.createDataFrame(
            merges, "rank LONG, left STRING, right STRING, freq LONG"
        )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(int(num_merges)):
        top = (
            vocab.select("n", F.explode(_adjacent_pairs(F.col("toks"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["freq"])
        merges.append((rank, a, b, freq))
        has_pair = F.exists(
            _adjacent_pairs(F.col("toks")),
            lambda p: (p["a"] == F.lit(a)) & (p["b"] == F.lit(b)),
        )
        prev = vocab
        # only words containing the winning pair are rewritten; the
        # rest pass through untouched (at real vocab sizes the touched
        # fraction collapses quickly with rank)
        vocab = mat(
            vocab.where(has_pair)
            .select("n", _merge_fold(F.col("toks"), a, b).alias("toks"))
            .unionByName(vocab.where(~has_pair)),
            "bpe-vocab",
        )
        # the returned merges are a driver-local list, so no landing is
        # referenced by the result — drop every superseded state
        # (including the initial one) as soon as its replacement is on
        # disk, and the final one below
        mat.drop(prev)
    mat.drop(vocab)
    if own_mat:
        mat.cleanup()
    return spark.createDataFrame(
        merges, "rank LONG, left STRING, right STRING, freq LONG"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with learned merge rules, applied in rank
    order (the standard encode pass): ``(doc_id, n_words, n_tokens)``.
    Chained Catalyst folds over the word array — keep ``merges`` to
    the small learned-rule lists this engine trains (each rule adds
    one fold to the expression tree)."""
    toks = _char_tokens(F.col("w"))
    for a, b in merges:
        toks = _merge_fold(toks, a, b)
    per_word = docs.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w"),
    ).where(F.length("w") > 0)
    return (
        per_word.select(id_col, F.size(toks).alias("_k"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("_k").cast("long").alias("n_tokens"),
        )
    )

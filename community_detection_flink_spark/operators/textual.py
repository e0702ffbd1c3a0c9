"""Text-analysis operators for training-data pipelines (SURVEY.md §2.10).

Language-ID (stopword heuristic), quality scoring, token counting, and
document fingerprinting — all built-in column expressions over the
``documents`` table, each with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from community_detection_flink_spark.operators.dedup import _hash60, tokens_col

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "en", "que", "por"],
}

# BPE-ish token pattern: words, numbers, or single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_stats(docs: DataFrame) -> DataFrame:
    """Token / length / punctuation statistics per document.

    n_tokens: whitespace tokens; n_bpeish: regexp token count
    (word/number/symbol pieces — a cheap BPE proxy); punct_ratio and
    space_ratio over characters.
    """
    text = F.col("text")
    toks = tokens_col(text)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_space = n_chars - F.length(F.regexp_replace(text, r"\s", ""))
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        # regexp_count, not size(regexp_extract_all): counting matches
        # without materializing the match array is ~4× faster (0.28s vs
        # 1.23s warm at sf0.1), same value for non-overlapping matches
        F.regexp_count(text, F.lit(BPE_RE)).cast("long").alias("n_bpeish"),
        F.try_divide(n_punct.cast("double"), n_chars.cast("double")).alias("punct_ratio"),
        F.try_divide(n_space.cast("double"), n_chars.cast("double")).alias("space_ratio"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0, 1]: length band + word shape.

    score = 0.4·len_ok + 0.3·(1 − punct_ratio·5 clamped) + 0.3·stopword
    presence — the standard cheap pre-filter shape for pretraining
    corpora (exact formula is this engine's own; oracle mirrors it).
    """
    text = F.col("text")
    toks = tokens_col(text)
    n_chars = F.length(text).cast("double")
    n_punct = (F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))).cast("double")
    punct_ratio = F.try_divide(n_punct, n_chars)
    len_ok = F.when((n_chars >= 100) & (n_chars <= 10000), 1.0).otherwise(0.0)
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    sw_hits = F.size(F.array_intersect(toks, sw)).cast("double")
    sw_ok = F.least(F.try_divide(sw_hits, F.lit(4.0)), F.lit(1.0))
    punct_ok = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
    return docs.select(
        "doc_id",
        (0.4 * len_ok + 0.3 * punct_ok + 0.3 * sw_ok).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language ID over {en, de, fr, es}; 'und' if no hits.

    Deterministic: the winner is the lexicographic max of
    (hit_count, code) — ties broken by code DESCENDING.  The DuckDB
    oracle mirrors the same max.
    """
    toks = F.array_distinct(tokens_col(F.col("text")))
    entries = []
    for code, words in sorted(STOPWORDS.items()):
        sw = F.array([F.lit(w) for w in words])
        hits = F.size(F.array_intersect(toks, sw))
        entries.append(F.struct(hits.alias("hits"), F.lit(code).alias("code")))
    best = F.reverse(F.array_sort(F.array(*entries)))[0]
    return docs.select(
        "doc_id",
        F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und")).alias("lang_pred"),
    )


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 100) -> DataFrame:
    """Corpus-wide top-k word n-grams by frequency.

    The frequency table is a plain explode + hash aggregate (map-side
    partial counts do the heavy lifting: the shuffle carries one row per
    distinct n-gram per partition, not per occurrence).  The final top-k
    is a TakeOrdered over the aggregated table — deterministic via the
    (count DESC, ngram ASC) total order, and never a single-partition
    global sort of the full table.

    Documents with fewer than ``n`` tokens contribute nothing (unlike
    ``shingles_col``, which falls back to the whole-text shingle for
    the dedup use case).
    """
    toks = tokens_col(F.col("text"))
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )
    return (
        docs.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("ngram").asc())
        .limit(k)
    )


def sample_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic hash-based train/val/test assignment.

    bucket = portable 60-bit md5 hash of (salt || id) mod 100 — stable
    across runs, cluster sizes, and engines (exact DuckDB oracle), which
    is the property that matters for held-out splits: re-running the
    pipeline on more data never moves an old document across splits.
    Pure per-row column expressions — no shuffle at all.
    """
    bucket = _hash60(F.concat(F.lit(salt), F.col(id_col).cast("string"))) % 100
    return docs.select(
        id_col,
        bucket.cast("long").alias("bucket"),
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


def fingerprint(docs: DataFrame, mod: int = 1_000_000_007, mult: int = 131) -> DataFrame:
    """Order-sensitive rolling document fingerprint.

    fold over tokens: acc = (acc·mult + h(token) mod M) mod M with a
    portable md5-derived token hash — same value computable in DuckDB
    via ``list_reduce``.  Keeps intermediate values < 2^40 so the fold
    never overflows signed 64-bit in either engine.
    """
    toks = tokens_col(F.col("text"))
    hashed = F.transform(toks, lambda t: _hash60(t) % mod)
    fp = F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * mult + h) % mod,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


def pack_chunks(
    docs: DataFrame, capacity: int = 512, shard_col: str = "source"
) -> DataFrame:
    """GPT-style sequence packing: concatenate each shard's token
    stream in doc_id order and cut fixed ``capacity``-token training
    chunks; one output row per (document, chunk) overlap.

    Output: ``doc_id, shard, chunk_id, tok_start, tok_end`` — the
    document's token span in the shard's global stream, clipped to the
    chunk (end exclusive).  A document longer than ``capacity`` spans
    several chunks; a chunk usually packs several short documents.

    Scale shape: packing needs a TOTAL order, which does not distribute
    — so the order is total only WITHIN a shard
    (``Window.partitionBy(shard)``), never global.  Shards pack in
    parallel, one shuffle each; at 100 TB shard by (source,
    date-bucket) so no single window partition exceeds an executor.
    Chunk membership is pure prefix-sum arithmetic (no iteration):
    a doc at stream offset ``off`` covering ``[off, cum)`` lands in
    chunks ``off div C .. (cum-1) div C``.

    Empty-token documents are dropped (they contribute no tokens to
    any chunk).
    """
    toks = tokens_col(F.col("text"))
    w = Window.partitionBy("shard").orderBy("doc_id")
    t = (
        docs.select(
            "doc_id",
            F.col(shard_col).alias("shard"),
            F.size(toks).cast("long").alias("n_tok"),
        )
        .where(F.col("n_tok") > 0)
        .withColumn("cum", F.sum("n_tok").over(w))
        .withColumn("off", F.col("cum") - F.col("n_tok"))
    )
    cap = F.lit(int(capacity))
    first = F.expr(f"off div {int(capacity)}")
    last = F.expr(f"(cum - 1) div {int(capacity)}")
    return t.select(
        "doc_id",
        "shard",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
        "off",
        "cum",
    ).select(
        "doc_id",
        "shard",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.greatest(F.col("off"), F.col("chunk_id") * cap).cast("long").alias("tok_start"),
        F.least(F.col("cum"), (F.col("chunk_id") + 1) * cap).cast("long").alias("tok_end"),
    )


def contamination_flags(
    docs: DataFrame, benchmark: DataFrame, ngram_n: int = 5
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word ``ngram_n``-gram with the benchmark set.

    Output: ``doc_id, contaminated, n_shared`` (distinct shared
    grams) for every corpus document.  Exact n-gram matching is the
    standard LLM decontamination test (13-gram in the common setting;
    smaller here for short synthetic docs).

    Scale shape: the benchmark's distinct gram set is the SMALL side —
    broadcast — while corpus grams stream through the join; per-doc
    ``array_distinct`` before the explode bounds the join input at one
    row per distinct gram per document.  Nothing is ever collected.
    """
    n = int(ngram_n)

    def grams(col):
        toks = tokens_col(col)
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        return F.when(
            F.size(toks) < n, F.array().cast("array<string>")
        ).otherwise(
            F.array_distinct(
                F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
            )
        )

    bench_grams = benchmark.select(
        F.explode(grams(F.col("text"))).alias("g")
    ).distinct()
    corpus_grams = docs.select(
        "doc_id", F.explode(grams(F.col("text"))).alias("g")
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return docs.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al.
    2021, "Scaling Language Models" §A1.1 — public filter family):
    repeated content is the strongest single predictor of low-quality
    training text.

      * ``dup_word_frac``     = 1 − |distinct tokens| / |tokens|
      * ``top_bigram_frac``   = occurrences of the most frequent word
                                bigram / |bigrams|
      * ``dup_trigram_frac``  = 1 − |distinct trigrams| / |trigrams|
      * ``flagged``           = top_bigram_frac > 0.18 OR
                                dup_trigram_frac > 0.30 (the published
                                Gopher thresholds for these two)

    Distinct counts are per-row ``array_distinct`` (JVM, linear in doc
    length); the bigram MODE is relational — explode → count → per-doc
    max — because a per-row nested-loop mode would be O(len²) in the
    expression engine and the explode shape is what scales on a
    cluster (combiner-friendly, one shuffle keyed by doc).
    """
    toks = tokens_col(F.col("text"))

    def _grams(n):
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        return F.when(
            F.size(toks) < n, F.array().cast("array<string>")
        ).otherwise(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        )

    base = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_tok_d"),
        F.size(_grams(2)).cast("long").alias("n_bg"),
        F.size(_grams(3)).cast("long").alias("n_tg"),
        F.size(F.array_distinct(_grams(3))).cast("long").alias("n_tg_d"),
    )
    top_bg = (
        docs.select("doc_id", F.explode(_grams(2)).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("long").alias("top_bg"))
    )
    dup_word = F.lit(1.0) - F.try_divide(
        F.col("n_tok_d").cast("double"), F.col("n_tok").cast("double")
    )
    top_bigram = F.coalesce(
        F.try_divide(F.col("top_bg").cast("double"), F.col("n_bg").cast("double")),
        F.lit(0.0),
    )
    dup_trigram = F.lit(1.0) - F.coalesce(
        F.try_divide(F.col("n_tg_d").cast("double"), F.col("n_tg").cast("double")),
        F.lit(1.0),
    )
    return (
        base.join(top_bg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(dup_word, F.lit(0.0)).alias("dup_word_frac"),
            top_bigram.alias("top_bigram_frac"),
            dup_trigram.alias("dup_trigram_frac"),
            ((top_bigram > 0.18) | (dup_trigram > 0.30)).alias("flagged"),
        )
    )


def stratified_sample(
    docs: DataFrame, n_per_key: int, key: str = "source", salt: str = "strat-v1"
) -> DataFrame:
    """Deterministic per-group sample: the ``n_per_key`` documents with
    the smallest ``md5(salt ‖ doc_id)`` inside each ``key`` group — a
    seedless, engine-stable reservoir (same property as
    ``sample_split``: membership is a pure function of the id, so
    re-runs, retries, and other engines agree row-for-row).

    The window ranks within each group — one shuffle keyed by ``key``;
    skewed group sizes are bounded by rank ≤ n_per_key before anything
    downstream.  For heavily-skewed keys at cluster scale, pre-filter
    with an approximate per-key quantile of the hash to cut the sort
    input (not needed at these sizes — documented escape hatch).
    """
    h = F.md5(F.concat_ws("", F.lit(salt), F.col("doc_id").cast("string")))
    w = Window.partitionBy(key).orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= n_per_key)
        .select("doc_id", F.col(key).alias("key"), "rank")
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """Canonical text cleanup — the first transform of every pretraining
    pipeline: strip control characters, collapse whitespace runs to a
    single space, trim, lowercase.

    Output: ``doc_id, clean_text, n_removed`` (chars dropped by the
    cleanup — a cheap corruption signal: high removal counts flag
    binary-ish or markup-heavy documents for the quality filters
    downstream).

    Pure per-row column expressions (regexp_replace chains compile into
    whole-stage codegen) — zero shuffle, and the regexes use only
    portable character classes so the DuckDB oracle (RE2) and Spark
    (Java regex) agree byte-for-byte.
    """
    text = F.col("text")
    cleaned = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(text, r"[\x00-\x1f\x7f]", " "), r"\s+", " "
            )
        )
    )
    return docs.select(
        "doc_id",
        cleaned.alias("clean_text"),
        (F.length(text) - F.length(cleaned)).cast("long").alias("n_removed"),
    )


def quality_weighted_sample(
    docs: DataFrame,
    quality: DataFrame,
    boost: float = 1.0,
    salt: str = "qsample-v1",
) -> DataFrame:
    """Importance sampling by quality score: keep each document with
    probability ``min(1, boost · quality)`` using the deterministic
    md5-uniform draw (same engine-stable construction as
    ``sample_split`` — membership is a pure function of the id, so
    re-runs and other engines agree row-for-row).

    ``quality``: ``(doc_id, quality)`` in [0, 1] — typically
    ``quality_score(docs)``.  Output: the kept ``(doc_id, quality,
    draw)`` rows.  This is the standard up/down-sampling step between
    scoring and tokenization in a pretraining data pipeline; at 100 TB
    it is a zero-shuffle filter when ``quality`` rides the same row
    (one broadcast/keyed join here because the score is a separate
    relation).
    """
    u = (
        _hash60(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
        .cast("double")
        / F.lit(float(2**60))
    )
    return (
        docs.select("doc_id")
        .join(quality, "doc_id")
        .select("doc_id", "quality", u.alias("draw"))
        .where(F.col("draw") < F.least(F.lit(1.0), F.lit(float(boost)) * F.col("quality")))
    )


# PII patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB/Go tooling): character classes, bounded
# and open quantifiers — no backreferences, no lookaround
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONGNUM = r"[0-9]{6,}"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact email-shaped tokens and long digit runs (≥6) from a text
    column — the standard PII pass between crawling and tokenization
    in a pretraining pipeline.

    Output: ``(doc_id, n_emails, n_longnums, scrub_md5, clean_text)``
    — redaction counts, an md5 fingerprint of the scrubbed text (what
    the driver-gate oracle matches byte-for-byte), and the scrubbed
    text itself.  Pure JVM ``regexp_replace``/``regexp_extract_all``
    column expressions: zero Python, zero shuffle, one scan — at
    100 TB this runs at parquet-read speed inside whole-stage codegen
    (PLANS.md pins 0 exchanges / 0 Python nodes).
    """
    text = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(text, PII_EMAIL, "<EMAIL>"), PII_LONGNUM, "<NUM>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(text_col, F.lit(PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(text_col, F.lit(PII_LONGNUM), F.lit(0)))
        .cast("long")
        .alias("n_longnums"),
        F.md5(scrubbed).alias("scrub_md5"),
        scrubbed.alias("clean_text"),
    )


def repeated_passages(
    docs: DataFrame, n: int = 8, min_docs: int = 2
) -> DataFrame:
    """Cross-document repeated-passage detection: hash every sliding
    ``n``-token window of every document and report window hashes that
    occur in at least ``min_docs`` DISTINCT documents.

    The exact-substring dedup primitive of LLM data pipelines (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — their 50-token exact-match criterion, here parameterized):
    upstream of MinHash because near-identical boilerplate shows up as
    *passages* inside otherwise-distinct pages.

    Scale shape: windows explode to ~|tokens| rows per doc (same order
    as the shingle pass MinHash already pays), hashed JVM-side before
    the shuffle so only ``(hash60, doc_id)`` longs move; one hash
    aggregate.  No suffix array, no driver state.  Output:
    ``(chunk_hash, n_docs, n_occ)`` — join back on the hash to locate
    the offending spans.
    """
    toks = tokens_col(F.col("text"))
    windows = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashed = docs.select(
        "doc_id", F.explode(windows).alias("chunk")
    ).select("doc_id", _hash60(F.col("chunk")).alias("chunk_hash"))
    return (
        hashed.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occ"),
        )
        .where(F.col("n_docs") >= min_docs)
    )

def winnowing_fingerprints(
    docs: DataFrame, k: int = 4, w: int = 8
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — the MOSS algorithm): per doc, hash every word
    ``k``-gram, slide a window of ``w`` consecutive hashes, and select
    the RIGHTMOST MINIMUM of each window.  Guarantees: every run of
    ``w`` consecutive k-grams contributes ≥1 fingerprint (no
    coverage gaps, unlike 0-mod-p sampling), and the selected set is
    position-robust (insertions far from a window don't change its
    selection) — the standard local fingerprinting scheme for
    partial-overlap / plagiarism-style detection, complementing the
    whole-document rolling hash in ``fingerprint`` above.

    Implementation is pure built-in expressions + ONE window
    aggregate: ``min`` over ``struct(hash, -pos)`` on a
    ``ROWS BETWEEN CURRENT ROW AND w-1 FOLLOWING`` frame computes the
    (min-hash, rightmost) selection of the window STARTING at each
    position in a single pass — no self-join over positions, no
    Python.  Per-doc window partitions are independent, so the single
    shuffle is ``hash(doc_id)`` and the operator scales horizontally
    with the corpus.  Documents shorter than ``w`` k-grams yield the
    one truncated window's minimum (the whole-doc min), matching the
    paper's boundary semantics.

    Output: ``doc_id, pos, fp`` — distinct selected positions
    (1-based k-gram index) with their 60-bit md5-derived k-gram hash.
    """
    from community_detection_flink_spark.operators.dedup import shingles_col

    sh = docs.select(
        "doc_id",
        F.posexplode(shingles_col(F.col("text"), k)).alias("pos0", "s"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        _hash60(F.col("s")).alias("g"),
    )
    part = Window.partitionBy("doc_id")
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = (
        sh.withColumn("n", F.count("*").over(part))
        .withColumn(
            "m",
            F.min(
                F.struct(F.col("g").alias("g"), (-F.col("pos")).alias("np"))
            ).over(frame),
        )
        # valid window starts only: pos ≤ max(n − w + 1, 1); for docs
        # shorter than w that keeps exactly the one truncated window
        .where(F.col("pos") <= F.greatest(F.col("n") - (w - 1), F.lit(1)))
        .select(
            "doc_id",
            (-F.col("m.np")).alias("pos"),
            F.col("m.g").alias("fp"),
        )
        .distinct()
    )
    return sel


def winnowing_overlap_pairs(
    docs: DataFrame,
    k: int = 4,
    w: int = 8,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Partial-overlap candidate pairs from winnowing fingerprints —
    the MOSS match step (Schleimer et al. SIGMOD'03 §4): two documents
    are overlap candidates when they share ≥ ``min_shared`` DISTINCT
    selected fingerprints.

    Pairs form ONLY inside fingerprint buckets (the LSH-bucket-join
    shape every operator in this family uses — never an all-pairs
    corpus join), and fingerprints selected in more than ``max_df``
    documents are dropped first: boilerplate k-grams carry no
    discriminating power and their buckets are exactly the quadratic
    hot spots (the standard MOSS "too common to report" rule, which
    is also what makes the plan skew-safe at corpus scale).

    Output: ``(doc_a, doc_b, n_shared)`` with ``doc_a < doc_b``.
    """
    fp = (
        winnowing_fingerprints(docs, k, w)
        .select("doc_id", "fp")
        .distinct()
    )
    rare = (
        fp.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .where(F.col("_df") <= max_df)
        .select("fp")
    )
    fp = fp.join(rare, "fp")
    a = fp.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def sliding_word_chunks(
    docs: DataFrame, chunk_words: int = 40, stride: int = 30
) -> DataFrame:
    """Sliding word-window chunking (round 8) — the standard RAG
    chunker: fixed ``chunk_words``-word windows every ``stride`` words
    (``chunk_words - stride`` words of overlap), as opposed to
    ``pack_chunks`` (greedy budget fill, no overlap) and
    ``cdc_chunks`` (content-defined boundaries).

    All JVM higher-order functions: split once, one ``posexplode``
    over the stride grid, ``slice`` + ``array_join`` + ``md5`` per
    window — zero Python, zero shuffle (pure scan-stage map), and the
    blob-sized text column never moves: only (doc_id, chunk_no,
    start_word, n_words, chunk_md5) flows downstream.  At 100 TB this
    is the shape that matters — chunk rows are ~100 bytes regardless
    of document size.
    """
    words = F.split(F.col("text"), " ")
    step1 = docs.select("doc_id", words.alias("w"))
    step2 = step1.select(
        "doc_id",
        "w",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("w") - 1, F.lit(0)),
                F.lit(stride),
            )
        ).alias("chunk_no", "start"),
    )
    chunk = F.expr(f"slice(w, start + 1, {chunk_words})")
    return step2.select(
        "doc_id",
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.col("start").cast("long").alias("start_word"),
        F.size(chunk).cast("long").alias("n_words"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


def mixture_sample(
    docs: DataFrame,
    budget_frac_bp: int = 5000,
    key: str = "source",
) -> DataFrame:
    """Deterministic dataset-mixture sampling — the pretraining
    data-mixing primitive: given per-source target WEIGHTS and a total
    document budget, accept a stable hash-defined subset of each
    source sized to its quota.

    Weights here derive from the source's 1-based rank in the
    lexicographic (binary/UTF-8) order of the distinct source names —
    skewed and reproducible without a side input, and
    environment-proof: both engines sort strings bytewise, whereas the
    previous ``srcN``-regexp derivation hash-diverged on the r9 driver
    (regexp_extract / HUGEINT-promotion are DuckDB-version-sensitive
    seams; VERDICT r9 "What's wrong" #1).  ``budget_frac_bp`` is the
    total budget in basis points of the corpus (5000 = half).

    Membership is a pure integer function of ``doc_id`` — no RNG
    state, so retries, restarts, and other engines agree row-for-row
    (the same property as ``sample_split``/``stratified_sample``):
    accept ⟺ ``(doc_id·2654435761 mod 2^20) · n_s < quota_s · 2^20``,
    all int64-exact (n_s may reach 2^42 before overflow).  Expected
    sample size per source is quota_s ± binomial noise; a source too
    small for its quota saturates (threshold ≥ 1 accepts everything)
    and the shortfall is visible in the output — the real-world
    mixing failure this operator exists to surface.

    Plan shape: one scan for per-source counts (tiny result,
    broadcast), one scan to flag membership, one aggregate — no
    shuffle of the corpus itself.  Output per source:
    ``(source, n_docs, quota, n_sampled, chars_sampled)``.
    """
    from pyspark.sql import Window

    m = 1 << 20
    counts = docs.groupBy(key).agg(F.count("*").cast("long").alias("n_docs"))
    # 1-based lexicographic rank of the source name — tiny DF (one row
    # per source), so the single-partition window is free
    rank = F.row_number().over(Window.orderBy(F.col(key))).cast("long")
    weighted = counts.select(key, "n_docs", rank.alias("w"))
    totals = weighted.agg(
        F.sum("n_docs").cast("long").alias("n_total"),
        F.sum("w").cast("long").alias("w_total"),
    )
    quotas = (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            key,
            "n_docs",
            # integer-exact: budget = n_total·bp div 10^4, then the
            # source's weight share of it
            F.expr(
                f"(n_total * {int(budget_frac_bp)} div 10000) * w div w_total"
            ).cast("long").alias("quota"),
        )
    )
    h = (F.col("doc_id").cast("long") * F.lit(2654435761)) % F.lit(m)
    flagged = (
        docs.join(F.broadcast(quotas), key)
        .withColumn("accept", h * F.col("n_docs") < F.col("quota") * F.lit(m))
    )
    return (
        flagged.groupBy(key, "n_docs", "quota")
        .agg(
            F.coalesce(F.sum(F.when(F.col("accept"), 1)), F.lit(0))
            .cast("long")
            .alias("n_sampled"),
            F.coalesce(F.sum(F.when(F.col("accept"), F.col("n_chars"))), F.lit(0))
            .cast("long")
            .alias("chars_sampled"),
        )
        .select(F.col(key).alias("source"), "n_docs", "quota", "n_sampled", "chars_sampled")
    )


def source_caps(
    docs: DataFrame,
    cap: int = 10,
    key: str = "source",
    skew_buckets: int | str | None = None,
    auto_target_rows: int = 2_000_000,
) -> DataFrame:
    """Per-source frequency capping (r10) — the RefinedWeb/CCNet-style
    domain cap: keep at most ``cap`` documents per source, chosen in a
    STABLE pseudo-random order (the same Knuth-hash membership function
    as ``mixture_sample``, so retries, restarts, and other engines keep
    the identical subset) rather than by position, which would bias
    toward crawl order.

    One shuffle on the source key, one rank window — and a SKEW LEVER
    (``skew_buckets``, r11 — implements the mitigation r10 only
    documented): a window over a mega-source serializes that source
    through one partition.  With ``skew_buckets = B`` the rank is
    computed EXACTLY but distributed: the hash domain (2²⁰) is split
    into B static ranges, per-(source, bucket) counts prefix-sum into
    bucket offsets (a window over ≤ B rows per source), and the final
    rank is offset + row_number within (source, bucket) — the
    mega-source now spreads over B partitions instead of one.  Bucket
    ranges are monotone in the hash, so rank-by-(hash, doc_id) is
    IDENTICAL to the single-window path by construction (pinned
    hash-equal on a 50%-skew fixture in tests/test_round11_ops.py).

    MEASURED regimes (SCALING.md r11, 20M rows / 50% mega-source):
    when the FULL ranking is consumed, the bucketed path is ~5×
    faster (6.6 vs 33 s — the mega-source sort serializes).  When
    only ``kept`` rows are consumed downstream, leave the default:
    Spark's WindowGroupLimit pushes ``pick_rank <= cap`` below the
    window as a per-partition top-cap pre-prune, which solves the
    skew natively (2 s) and beats the bucketed path's extra
    aggregate+join (6 s).  The default single window is also the
    oracle-pinned gate path.

    ``skew_buckets="auto"`` (r12, VERDICT r11 #8) derives the lever
    from the DATA instead of a caller flag: one exact per-source count
    aggregate (map-side combinable, tiny result — the corpus never
    shuffles) finds the largest source; if it exceeds
    ``auto_target_rows`` (the rows one task should sort), the bucketed
    path activates with ``B = ceil(max_source / auto_target_rows)``
    clamped to [2, 64], else the plan is the UNMODIFIED single window
    (balanced data pays one cheap aggregate, nothing else — A/B'd in
    SCALING.md r12).  The measured kept-only rule still stands: auto
    is for FULL-ranking consumers; kept-only consumers should keep the
    default (WindowGroupLimit already pre-prunes per partition).

    Output: ``(doc_id, source, pick_rank, kept)`` for every document.
    """
    from pyspark.sql import Window

    if skew_buckets == "auto":
        mx = (
            docs.groupBy(key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(F.max("_n"))
            .first()[0]
            or 0
        )
        # floor of 16: the offsets window is over <= B rows per source
        # (free), so once the lever activates, spreading wider is
        # all win until task counts explode — 16 is the r11-measured
        # sweet spot, and B grows with the mega source past 32M rows
        skew_buckets = (
            min(64, max(16, -(-int(mx) // int(auto_target_rows))))
            if mx > int(auto_target_rows)
            else None
        )
    elif isinstance(skew_buckets, str):
        raise ValueError(f"unknown skew_buckets mode {skew_buckets!r}")

    h = F.pmod(F.col("doc_id").cast("long") * F.lit(2654435761), F.lit(1 << 20))
    if skew_buckets and int(skew_buckets) > 1:
        B = int(skew_buckets)
        width = (1 << 20) // B + 1
        base = docs.select(
            "doc_id",
            F.col(key).alias("source"),
            h.alias("_h"),
            F.floor(h / F.lit(width)).cast("long").alias("_b"),
        )
        w_off = (
            Window.partitionBy("source")
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = (
            base.groupBy("source", "_b")
            .agg(F.count(F.lit(1)).alias("_n"))
            .select(
                "source",
                "_b",
                F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
            )
        )
        w_in = Window.partitionBy("source", "_b").orderBy(
            F.col("_h").asc(), F.col("doc_id").asc()
        )
        # no broadcast hint on offs: it is (sources × B) rows — tiny
        # here, but at 100 TB sources run to millions; AQE may still
        # broadcast it when runtime stats allow
        return (
            base.join(offs, ["source", "_b"])
            .select(
                "doc_id",
                "source",
                (F.col("_off") + F.row_number().over(w_in))
                .cast("long")
                .alias("pick_rank"),
            )
            .withColumn("kept", F.col("pick_rank") <= int(cap))
        )
    w = Window.partitionBy(key).orderBy(h.asc(), F.col("doc_id").asc())
    return docs.select(
        "doc_id",
        F.col(key).alias("source"),
        F.row_number().over(w).cast("long").alias("pick_rank"),
    ).withColumn("kept", F.col("pick_rank") <= int(cap))


def char_entropy(docs: DataFrame) -> DataFrame:
    """Per-document Shannon entropy of the character distribution (in
    nats) — the classic cheap quality/repetition signal: natural prose
    sits near the language's ~3-nat ceiling, boilerplate and
    mode-collapsed generations sit far below it (a Gopher-rules-style
    filter axis alongside ``quality_score`` and ``repetition_stats``).

    One char-level explode (``n_chars`` total rows), one
    ``(doc_id, char)`` hash aggregate with map-side combine, one
    per-doc fold — the document length rides along so no join back is
    needed.  Exactness contract (the ``unigram_nll`` pattern): each
    ``−p·ln p`` term rounds to 9 decimals (libm ulp differences sit
    at ~1e-15) and sums through DECIMAL(28,9) — order-independent and
    oracle-hashable.  Empty documents emit no row.

    Output: ``(doc_id, n_chars, n_unique_chars, entropy)``.
    """
    chars = docs.where(F.length("text") >= 1).select(
        "doc_id",
        F.length("text").alias("_n"),
        F.expr(
            "explode(transform(sequence(1, length(text)),"
            " i -> substring(text, i, 1)))"
        ).alias("_c"),
    )
    counts = chars.groupBy("doc_id", "_n", "_c").agg(
        F.count("*").alias("_k")
    )
    p = F.col("_k").cast("double") / F.col("_n").cast("double")
    term = F.round(-p * F.log(p), 9).cast("decimal(28,9)")
    return counts.groupBy("doc_id").agg(
        F.first("_n").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("n_unique_chars"),
        F.sum(term).cast("double").alias("entropy"),
    )

"""Keyword search / relevance ranking over the documents table
(SURVEY.md §2.10 engine extensions — the retrieval counterpart of the
embedding ANN operators in ``similarity.py``).

BM25 (Robertson/Spärck Jones, the classic probabilistic ranking
function) expressed as pure relational algebra: term frequencies are
an explode + hash aggregate, document frequencies and corpus averages
are broadcast one-row/tiny aggregates, and the score is a per-(doc,
term) column expression summed per doc.  No UDFs, no collected state.

Scale shape: the corpus-side explode is filtered to the QUERY terms
before the aggregate — the shuffle carries only rows for terms the
query mentions (|q| ≪ vocabulary), so a 100 TB corpus scans once and
shuffles almost nothing.  The df/avgdl statistics are tiny aggregates
joined via broadcast.  For a standing search service the tf table is
the inverted index you'd land bucketed by term
(``sources/bucketed.py``); for ad-hoc scoring this single-pass shape
is already optimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from community_detection_flink_spark.operators.dedup import tokens_col


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the standard
    non-negative BM25 idf.

    Output ``(doc_id, score)``, ordered by (score DESC, doc_id ASC),
    exactly ``k`` rows (fewer if fewer docs match any term).  Scores
    are rounded to 6 decimals BEFORE the ordering so rank ties resolve
    identically across engines (float summation order differs at
    ~1e-15 relative — far below the rounding grain).

    Only documents containing ≥ 1 query term are scored; ``dl`` is the
    whitespace-token count (same tokenizer as the dedup family).
    """
    terms = sorted(set(query_terms))
    toks = tokens_col(F.col("text"))
    # one corpus scan: per-doc length + the query-term frequencies
    base = docs.select("doc_id", toks.alias("tk")).select(
        "doc_id", F.size("tk").cast("double").alias("dl"), "tk"
    )
    tf = (
        base.select("doc_id", "dl", F.explode("tk").alias("tok"))
        .where(F.col("tok").isin(terms))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    stats = F.broadcast(
        docs.agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg(F.size(tokens_col(F.col("text")))).alias("avgdl"),
        )
    )
    df_t = F.broadcast(
        tf.groupBy("tok").agg(F.countDistinct("doc_id").cast("double").alias("df"))
    )
    scored = (
        tf.join(df_t, "tok")
        .crossJoin(stats)
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms (keyword extraction).

    score(d, t) = tf · (ln((1 + N) / (1 + df)) + 1) — the smoothed
    idf (sklearn's formulation), never negative, so single-doc corpora
    still rank.  Output ``(doc_id, rank, term, score)``, rank 1..k by
    (score DESC, term ASC); scores rounded to 6 decimals BEFORE the
    rank so the per-doc ordering is engine-stable.

    Scale shape: tf is the standard explode + combiner-friendly hash
    aggregate; df aggregates the tf table again (vocabulary-sized, one
    row per distinct term — no second corpus scan).  The tf⋈df join is
    term-keyed; at 100 TB both sides are already partitioned by term
    from their aggregates, so AQE reuses the exchange.  The final
    window partitions by doc — bounded at vocabulary-per-doc rows."""
    toks = tokens_col(F.col("text"))
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    n1 = F.broadcast(docs.agg(F.count("*").cast("double").alias("n_docs")))
    df_t = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    scored = (
        tf.join(df_t, "term")
        .crossJoin(n1)
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "score")
    )


def unigram_nll(docs: DataFrame) -> DataFrame:
    """Per-document unigram negative log-likelihood — the cheap
    perplexity-style quality signal (CCNet, Wenzek et al. 2020): docs
    whose tokens are improbable under the corpus's own unigram model
    score high and get filtered or down-weighted.

    Model and scoring in one pass over the exploded tokens: the vocab
    (token → ln p) is a hash aggregate joined back onto the token
    stream on the token key, so the corpus text shuffles once as
    (doc_id, token) pairs and nothing else.  No held-out smoothing is needed — every token
    is in-vocabulary by construction (self-scoring); swap the vocab
    DataFrame to score a NEW corpus under an old model, where the
    standard add-one floor applies.

    Exactness contract: per-token ln p is rounded to 9 decimals (libm
    ulp differences across engines sit at ~1e-15), then summed through
    DECIMAL(28,9) — order-independent and oracle-hashable.  Output:
    ``(doc_id, n_tokens, nll, mean_nll)``.
    """
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    # corpus token total as a 1-row broadcast crossJoin (modularity
    # pattern) — no driver-side action, stays one logical pass.  The
    # vocab itself is NOT broadcast-hinted: on web-scale corpora the
    # distinct-token set is huge (URLs, typos), so the token-keyed
    # equi-join must be free to shuffle; AQE broadcasts it when small.
    tot = toks.agg(F.count("*").cast("double").alias("_total"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("double").alias("_c"))
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.round(-F.log(F.col("_c") / F.col("_total")), 9).alias("nlp"),
        )
    )
    return (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.col("nlp").cast("decimal(28,9)"))
            .cast("double")
            .alias("nll"),
        )
        .withColumn(
            "mean_nll",
            F.try_divide(F.col("nll"), F.col("n_tokens").cast("double")),
        )
    )


def phrase_search(docs: DataFrame, phrase: str = "key agg row") -> DataFrame:
    """Positional-inverted-index phrase matching: for each document
    containing ``phrase`` as consecutive whitespace tokens, the exact
    occurrence count and the first match position (0-based word
    offset).

    The classic positional-postings intersection: ``posexplode`` the
    token stream once, keep ONLY postings for the query's terms, and
    join term i's postings on ``(doc_id, pos - i)`` so every surviving
    ``start`` is a full consecutive match.  In this ad-hoc form
    Catalyst materializes one column-pruned pass over ``(doc_id,
    text)`` per query term (each filtered to that term's postings
    before any join); for a standing service, land the exploded
    postings ONCE bucketed by term (``sources/bucketed.py``) and each
    probe reads |q| posting buckets with zero corpus scans — that
    landed table is exactly the inverted index.  Intersect rarest-term-first
    at scale so the join frontier stays at the smallest posting list.
    Contrast with the LIKE-scan the DuckDB oracle runs: same answer,
    but the scan repeats per query instead of amortizing into an
    index.  Zero Python; two hash joins for a 3-word phrase.
    """
    terms = phrase.split(" ")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    matches = None
    for i, t in enumerate(terms):
        p = toks.where(F.col("w") == t).select(
            "doc_id", (F.col("pos") - i).cast("long").alias("start")
        )
        matches = p if matches is None else matches.join(p, ["doc_id", "start"])
    return matches.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_matches"),
        F.min("start").alias("first_pos"),
    )

"""Deduplication operators for large-scale document pipelines.

Extension surface required by BASELINE.json (SURVEY.md §2.10) — not in
the reference repo; designed Spark-first for 100 TB document tables.

Portability note: all hashing is md5-based (``conv(substr(md5(x),1,15),
16,10)`` → 60-bit non-negative int) so every operator here has an
exact DuckDB oracle (``('0x'||substr(md5(x),1,15))::BIGINT``) — unlike
Spark's ``xxhash64``/``hash`` which are engine-private.  md5 is a few
ns/row slower than xxhash64 but keeps the correctness gate closed; swap
``_hash60`` for ``xxhash64`` in production if oracle parity is not
needed.

Input convention: ``docs`` has columns ``doc_id`` (long), ``text``
(string) — extra columns pass through where noted.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"\s+"


def _hash60(col: Column) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5 as a bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens_col(text: Column) -> Column:
    """Lowercased whitespace tokens (empty strings removed)."""
    return F.array_remove(F.split(F.lower(text), TOKEN_RE), "")


def let_col(value: Column, body) -> Column:
    """Let-binding for expression-level common subexpressions:
    evaluate ``value`` ONCE per row and refer to it as a lambda
    variable inside ``body(v)``.

    Why this exists: higher-order functions (``transform`` /
    ``aggregate`` / ``filter``) are CodegenFallback in Spark — they
    evaluate INTERPRETED, outside whole-stage codegen and its
    subexpression elimination — so every REFERENCE to a shared
    expression subtree re-evaluates it.  Worse, Project-through-
    Repartition pushdown dissolves "compute in a previous select"
    barriers.  Measured on the MinHash banding: the band array
    referenced the signature 4× and the signature referenced the md5
    shingle base 16×, re-hashing every shingle 64× (3.9s vs 0.4s per
    pass at sf0.1).  ``element_at(transform(array(value), body), 1)``
    evaluates ``value`` exactly once; lambda-variable references are
    lookups, not re-evaluations.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def shingles_col(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings ("a b c")."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by text hash: one row per distinct text
    with the representative (min doc_id) and the duplicate count.

    Hash-groupBy — one shuffle on the md5 of the text, which also
    handles multi-TB inputs (the text itself never shuffles twice).
    """
    return (
        docs.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("representative"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select("representative", "n_copies")
    )


MINHASH_MOD = 1_000_000_007
MINHASH_A = 48_271  # MINSTD multiplier; a_i = A^(i+1) mod p, b_i = i·B
MINHASH_B = 2_147_483_647


def minhash_signatures(docs: DataFrame, num_hashes: int = 16, shingle_n: int = 3) -> DataFrame:
    """Per-doc MinHash signature: ``doc_id, sig array<long>[num_hashes]``.

    Standard one-base-hash construction: each shingle is md5-hashed
    ONCE (the expensive part), then the i-th permutation is the affine
    map h_i(x) = (a_i·x + b_i) mod p with p = 1e9+7, a_i = 48271^(i+1)
    mod p, b_i = i·(2^31−1) mod p.  All operands stay < 2^61 so the
    arithmetic is exact in int64 on any engine — the DuckDB oracle
    reproduces it bit-for-bit.  All JVM-side (``transform`` +
    ``array_min``), no shuffle: signatures compute in the scan stage.
    """
    return docs.select(
        "doc_id", _sig_col(F.col("text"), num_hashes, shingle_n).alias("sig")
    )


def _affine(a_i: int, b_i: int):
    # PySpark inspects lambda arity: keep exactly one parameter
    return lambda x: (x * a_i + b_i) % MINHASH_MOD


def _sig_col(text: Column, num_hashes: int, shingle_n: int) -> Column:
    """The MinHash signature as ONE expression: the md5 shingle base is
    let-bound so the ``num_hashes`` permutations traverse a computed
    array instead of re-hashing every shingle per permutation (see
    ``let_col``)."""
    sh = shingles_col(text, shingle_n)
    base = F.transform(sh, lambda s: _hash60(s) % MINHASH_MOD)
    return let_col(
        base,
        lambda mh: F.array(
            *[
                F.array_min(F.transform(mh, _affine(a_i, b_i)))
                for a_i, b_i in minhash_coeffs(num_hashes)
            ]
        ),
    )


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """(a_i, b_i) for the affine MinHash permutations (shared with the
    DuckDB oracle generator)."""
    coeffs = []
    a = 1
    for i in range(num_hashes):
        a = (a * MINHASH_A) % MINHASH_MOD
        coeffs.append((a, (i * MINHASH_B) % MINHASH_MOD))
    return coeffs


def _banded(docs: DataFrame, num_hashes: int, bands: int, shingle_n: int) -> DataFrame:
    """``(doc_id, band, bucket)`` — one row per (doc, band).  The band
    hashes are ONE let-bound expression: the signature (itself
    let-binding its md5 shingle base) is evaluated once per doc and
    sliced per band — without the binding, interpreted HOF evaluation
    re-hashed every shingle bands × num_hashes times (see ``let_col``;
    a repartition "barrier" doesn't help — Project pushes through it).
    """
    rows_per_band = num_hashes // bands
    bands_expr = let_col(
        _sig_col(F.col("text"), num_hashes, shingle_n),
        lambda sig: F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.md5(
                F.concat_ws(",", F.slice(sig, b * rows_per_band + 1, rows_per_band))
            ),
        ),
    )
    return docs.select("doc_id", F.posexplode(bands_expr).alias("band", "bucket"))


def cross_corpus_near_dups(
    docs: DataFrame,
    reference: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Documents of ``docs`` near-duplicating ANY document of
    ``reference`` — the cross-corpus dedup a training pipeline runs
    whenever a new dump lands: dedupe train against eval benchmarks,
    or a new crawl against the previous dumps.

    Candidates come from shared MinHash LSH buckets — the reference's
    band rows ride a BROADCAST (the reference is the small side in
    both canonical uses; for dump-vs-dump at similar scale drop the
    hint and it is a plain (band, bucket) shuffle join) — then every
    candidate is verified with EXACT Jaccard over distinct shingles,
    so the only approximation is candidate RECALL (missed pairs), the
    same contract as ``minhash_lsh_pairs``.  The corpus side streams:
    one scan to band, one semi-join-shaped candidate join, exact
    verify only on candidates.

    Output: ``doc_id, ref_id, jaccard`` (≥ threshold), doc_id from
    ``docs``, ref_id from ``reference``.
    """
    cand = (
        _banded(docs, num_hashes, bands, shingle_n)
        .join(
            F.broadcast(
                _banded(reference, num_hashes, bands, shingle_n)
                .withColumnsRenamed({"doc_id": "ref_id"})
            ),
            ["band", "bucket"],
        )
        .select("doc_id", "ref_id")
        .distinct()
    )
    sarr = F.array_distinct(shingles_col(F.col("text"), shingle_n))
    corpus_arr = docs.select("doc_id", sarr.alias("arr_a"))
    ref_arr = reference.select(F.col("doc_id").alias("ref_id"), sarr.alias("arr_b"))
    return (
        cand.join(corpus_arr, "doc_id")
        .join(F.broadcast(ref_arr), "ref_id")
        .select(
            "doc_id",
            "ref_id",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("common"),
            F.size("arr_a").alias("sz_a"),
            F.size("arr_b").alias("sz_b"),
        )
        .select(
            "doc_id",
            "ref_id",
            (
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows;
    docs sharing any band land in the same bucket (shuffle keyed on
    (band, bucket-hash) — never on the raw text), then pairs are
    emitted per bucket with a self-join.  Output:
    ``doc_a < doc_b, n_bands`` (number of agreeing bands).

    Scale: bucket sizes are the skew risk; genuinely identical texts
    produce identical signatures, so buckets are bounded by duplicate
    multiplicity, and the (band, bucket) shuffle key spreads load.
    """
    banded = _banded(docs, num_hashes, bands, shingle_n)
    # pairs in ONE pass: collect each bucket's members and explode the
    # i<j combinations — half the compute of the former self-join (the
    # banded subplan ran once per join side) and one less shuffle.
    # Bucket lists are bounded by duplicate multiplicity (identical
    # texts ⇒ identical signatures), the documented skew bound.
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(
                    F.least(x, y).alias("doc_a"), F.greatest(x, y).alias("doc_b")
                ),
            ),
        )
    )
    return (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .where(F.size(ids) > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_bands"))
    )


@dataclass
class MinHashStore:
    """Handle to a PERSISTED banded-signature store: the catalog name
    of a ``(doc_id, band, bucket)`` table bucketed by (band, bucket),
    plus the signature parameters frozen at build time.  The dedup
    twin of ``similarity.IVFIndex`` (r10, VERDICT r9 #8's maintenance
    theme): a 100 TB corpus appends documents continuously, and
    re-shingling the whole corpus per batch is the cost this store
    amortizes — signatures are a pure per-document function, so
    appends are EXACT (no drift, unlike IVF's frozen centroids; the
    parity test pins store-built pairs == full-recompute pairs
    bit-for-bit)."""

    table: str
    num_hashes: int
    bands: int
    shingle_n: int
    n_buckets: int


def build_minhash_store(
    docs: DataFrame,
    table: str = "minhash_store",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> MinHashStore:
    """Build and persist the banded MinHash signature store: one scan
    shingles + signs every document (the expensive part — the text
    never leaves the scan stage), and the ~bands rows per document
    land bucketed by (band, bucket) so the candidate-pair read is
    exchange-free."""
    from community_detection_flink_spark.sources.bucketed import (
        bucket_count,
        write_bucketed,
    )

    banded = _banded(docs, num_hashes, bands, shingle_n)
    est_bytes = docs.count() * bands * 56  # (long, int, md5 string)
    nb = bucket_count(est_bytes)
    write_bucketed(
        banded, table, ["band", "bucket"], nb, sort_keys=["band", "bucket"]
    )
    return MinHashStore(table, num_hashes, bands, shingle_n, nb)


def minhash_store_append(store: MinHashStore, new_docs: DataFrame) -> MinHashStore:
    """Append new documents' banded signatures to the store — one scan
    over the DELTA only, same bucket spec, exact by construction.

    Re-appended doc_ids are GUARDED against (r11, closes the r10
    ADVICE finding): the delta is anti-joined on the store's distinct
    doc_ids before shingling, so a retried or overlapping append can
    never write duplicate signature rows (which would make the bucket
    pair-explode emit doc_a == doc_b rows and inflate n_bands).  The
    id-set read is a store-only column scan — the delta text is never
    re-shingled for already-present ids."""
    spark = new_docs.sparkSession
    existing = spark.table(store.table).select("doc_id").distinct()
    new_docs = new_docs.join(existing, "doc_id", "left_anti")
    banded = _banded(new_docs, store.num_hashes, store.bands, store.shingle_n)
    (
        banded.write.mode("append")
        .format("parquet")
        .bucketBy(store.n_buckets, "band", "bucket")
        .sortBy("band", "bucket")
        .saveAsTable(store.table)
    )
    return store


def minhash_pairs_from_store(spark, store: MinHashStore) -> DataFrame:
    """Candidate near-duplicate pairs read from the persisted store:
    the same bucket-collect + i<j explode as ``minhash_lsh_pairs``,
    but the groupBy reads pre-bucketed data — the plan carries NO
    exchange before the pair aggregate, so a pair refresh after an
    append touches only the store, never the corpus text."""
    banded = spark.table(store.table)
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(
                    F.least(x, y).alias("doc_a"), F.greatest(x, y).alias("doc_b")
                ),
            ),
        )
    )
    return (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .where(F.size(ids) > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_bands"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 1,
    mat=None,
) -> DataFrame:
    """EXACT Jaccard-similar pairs over distinct word n-grams, via
    prefix filtering (the AllPairs/PPJoin scheme, Bayardo et al.
    WWW'07) — same answers as the naive shingle self-join, without its
    Σ freq² blowup on stopword shingles.

    Sort every doc's shingle set by one GLOBAL order (document
    frequency asc, shingle asc).  If J(A,B) ≥ t, the first
    ``|X| − ⌈t·|X|⌉ + 1`` shingles of each side (its *prefix*) must
    share an element — so candidate pairs are generated by self-joining
    only prefix shingles.  The globally most frequent shingles sort
    LAST, landing outside almost every prefix: "the" (df ≈ N) never
    drives the join, so fan-out is bounded by rare-shingle frequencies.
    A size filter (min ≥ t·max) prunes further.  Candidates are then
    verified EXACTLY with ``array_intersect`` on the full per-doc
    shingle arrays — no false negatives (prefix theorem), no false
    positives (exact verify).

    Output: ``doc_a < doc_b, jaccard`` (double), filtered ≥ threshold.

    ``mat`` (optional ``plans.Materializer``): the exploded shingle
    relation feeds FIVE subplans (ranking, document frequencies,
    sizes, both prefix join sides, verify arrays) — uncached, each
    re-evaluates the shingling scan (measured ≈ 3s per evaluation at
    sf0.1, the dominant cost).  The intermediates are cached FORCED
    (through ``mat.cache`` when given — caller releases — else
    persist+count): an unforced persist is raced by the concurrently
    scheduled consumer stages, which each recompute it before the
    cache lands (measured: no speedup at all unforced, 12s → 4s
    forced).  The verify arrays are rebuilt from the cached shingle
    rows (``collect_list``) instead of re-shingling — their order is
    irrelevant to ``array_intersect`` sizing.
    """
    def _cache(df, name):
        if mat is not None:
            return mat.cache(df, name)
        df = df.persist()
        df.count()
        return df

    sarr = F.array_distinct(shingles_col(F.col("text"), shingle_n))
    sh = _cache(docs.select("doc_id", F.explode(sarr).alias("s")), "jac-shingles")
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    ranked = sh.join(dfreq, "s").withColumn(
        "pos", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # prefix length |X| - ceil(t*|X|) + 1; the 1e-9 guards float noise in
    # t*|X| from shrinking the prefix (longer prefix = safe direction)
    pref = _cache(
        ranked.join(sizes, "doc_id")
        .where(F.col("pos") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - 1e-9) + 1)
        .select("doc_id", "s", "sz"),
        "jac-prefix",
    )
    a = pref.withColumnsRenamed({"doc_id": "doc_a", "sz": "sz_a"})
    b = pref.withColumnsRenamed({"doc_id": "doc_b", "sz": "sz_b"})
    cand = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(
            F.least("sz_a", "sz_b").cast("double")
            >= F.lit(threshold) * F.greatest("sz_a", "sz_b").cast("double")
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    arrays = sh.groupBy("doc_id").agg(F.collect_list("s").alias("sarr"))
    return (
        cand.join(arrays.withColumnsRenamed({"doc_id": "doc_a", "sarr": "arr_a"}), "doc_a")
        .join(arrays.withColumnsRenamed({"doc_id": "doc_b", "sarr": "arr_b"}), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("common"),
            F.size("arr_a").alias("sz_a"),
            F.size("arr_b").alias("sz_b"),
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """Per-doc SimHash fingerprint over word tokens: ``doc_id, simhash``.

    Classic bit-vote construction: each token votes ±1 on each bit of
    its 60-bit md5-derived hash; the fingerprint takes the sign of each
    bit's total.  Implemented as ``bits`` parallel conditional sums in
    ONE hash aggregate (all whole-stage codegen; no explode to
    (token × bit) rows).
    """
    toks = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    ).withColumn("h", _hash60(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    bits: int = 32,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """EXACT SimHash near-duplicate pairs: ``doc_a < doc_b, hamming``
    with Hamming distance ≤ ``max_hamming`` between fingerprints.

    Scale shape: banded pigeonhole, not an all-pairs scan.  The
    ``bits``-bit fingerprint splits into ``bands`` equal bands; two
    fingerprints within Hamming distance d < bands must agree EXACTLY
    on at least one band (d differing bits can dirty at most d bands),
    so candidate pairs come from a self-join keyed on (band, band
    value) — the same bounded-bucket shuffle as MinHash LSH — and are
    then verified exactly with ``bit_count(xor)``.  No false negatives
    (pigeonhole), no false positives (exact verify): answers equal the
    naive O(n²) scan the DuckDB oracle runs.

    Requires ``max_hamming < bands`` (the pigeonhole condition).
    """
    if max_hamming >= bands:
        raise ValueError("pigeonhole needs max_hamming < bands")
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    width = bits // bands
    mask = (1 << width) - 1
    sims = simhash(docs, bits)
    banded = sims.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask))
                    for b in range(bands)
                ]
            )
        ).alias("band", "bval"),
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "bval"
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "bval"
    )
    return (
        a.join(b, ["band", "bval"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force).

    ``emb``: vec_id long, embedding array<float>.  Cosine via
    JVM ``aggregate``/``zip_with`` expressions.  O(n²) — the scale path
    buckets by LSH first (``similarity.random_hyperplane_buckets``) and
    runs this within buckets.
    """
    from community_detection_flink_spark.operators.similarity import cosine_col

    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_col(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def embedding_near_dups_blocked(
    emb: DataFrame, block_col: str = "label", threshold: float = 0.35
) -> DataFrame:
    """Embedding-cosine near-dup pairs restricted to a blocking key.

    The scale-correct shape of ``embedding_near_dups``: pairs are only
    formed WITHIN a block (a coarse cluster id, IVF cell, or LSH
    bucket), so the join is an equi-join on ``block_col`` — cost is
    Σ per-block n², never corpus n².  Exact cosine inside the block, so
    the answer is exact w.r.t. the blocking relation (pairs across
    blocks are by definition out of scope).
    """
    from community_detection_flink_spark.operators.similarity import cosine_col

    a = emb.select(
        F.col(block_col).alias("_blk"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    )
    b = emb.select(
        F.col(block_col).alias("_blk"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_col(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def minhash_estimate_quality(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    mean_bound: float = 0.10,
    p95_bound: float = 0.25,
    max_bound: float = 0.50,
) -> DataFrame:
    """Measured quality contract for MinHash Jaccard ESTIMATION (the
    ``emb_ann_quality`` pattern applied to the dedup family): for every
    LSH candidate pair, the signature-overlap estimate
    (#equal components / k, E[est] = J, σ = √(J(1−J)/k)) is compared
    against the EXACT shingle Jaccard, and the error distribution is
    pinned as boolean rows an exact oracle can hash-match.

    This turns "MinHash approximates Jaccard" from folklore into a
    regression-checked measurement: mean |err| ≤ ``mean_bound``,
    p95 ≤ ``p95_bound``, max ≤ ``max_bound`` at k=32.  Estimates and
    exact Jaccards are per-pair column expressions (zip_with /
    array_intersect); only the tiny candidate set is scored, never all
    pairs, and the signature/shingle lookups are plain doc-id
    equi-joins (AQE broadcasts them when actually small — no forced
    broadcast of corpus-sized sides).
    """
    sigs = minhash_signatures(docs, num_hashes, shingle_n)
    pairs = minhash_lsh_pairs(docs, num_hashes, bands, shingle_n)
    sh = F.array_distinct(shingles_col(F.col("text"), shingle_n))
    sets = docs.select("doc_id", sh.alias("sh"))
    # no broadcast hints: sigs/sets are CORPUS-sized (only the
    # candidate pair set is small) — unhinted equi-joins let AQE
    # broadcast when a side is actually small, and at 100 TB these
    # plan as shuffle joins keyed on doc id, which is correct
    scored = (
        pairs.join(
            sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")),
            "doc_b",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .select(
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda t: t,
                    )
                ).cast("double")
                / float(num_hashes)
            ).alias("est"),
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double").alias("ni"),
            F.size("sh_a").cast("double").alias("na"),
            F.size("sh_b").cast("double").alias("nb"),
        )
        .select(
            F.abs(
                F.col("est")
                - F.try_divide(
                    F.col("ni"), F.col("na") + F.col("nb") - F.col("ni")
                )
            ).alias("err")
        )
    )
    agg = scored.agg(
        F.avg("err").alias("mean_err"),
        F.expr("percentile(err, 0.95)").alias("p95_err"),
        F.max("err").alias("max_err"),
        F.count("*").alias("n_pairs"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(f"minhash_mean_abs_err_le_{mean_bound}").alias("metric"),
                    (F.col("mean_err") <= mean_bound).alias("ok"),
                ),
                F.struct(
                    F.lit(f"minhash_p95_abs_err_le_{p95_bound}").alias("metric"),
                    (F.col("p95_err") <= p95_bound).alias("ok"),
                ),
                F.struct(
                    F.lit(f"minhash_max_abs_err_le_{max_bound}").alias("metric"),
                    (F.col("max_err") <= max_bound).alias("ok"),
                ),
                F.struct(
                    F.lit("minhash_candidates_nonempty").alias("metric"),
                    (F.col("n_pairs") > 0).alias("ok"),
                ),
            )
        ).alias("c")
    ).select("c.metric", "c.ok")

def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    shingle_n: int = 3,
    mat=None,
) -> DataFrame:
    """EXACT containment-similar ORDERED pairs over distinct word
    n-gram shingles: ``C(A,B) = |S(A) ∩ S(B)| / |S(A)| ≥ t``.

    Containment is the *asymmetric* near-dup relation — it catches a
    short document that is mostly a subset of a longer one (a quoted
    passage, an excerpt, a page embedded in a crawl dump), which
    symmetric Jaccard misses because the size difference drags
    ``|A∩B| / |A∪B|`` below any useful threshold.  Standard tool in
    LLM-corpus cleaning next to Jaccard dedup (the reference engine
    has no text surface at all; this extends the §2.10 dedup family).

    Scale path — prefix filtering, adapted to the asymmetric case:
    sort every doc's shingle set by one global order (document
    frequency asc, shingle asc).  If ``|A∩B| ≥ ⌈t·|A|⌉`` then the
    first ``|A| − ⌈t·|A|⌉ + 1`` shingles of A (its *prefix*) must
    share an element with B — otherwise the intersection fits inside
    A's suffix, which has only ``⌈t·|A|⌉ − 1`` elements.  So
    candidates come from joining A-side PREFIX shingles against
    B-side FULL shingle rows; globally frequent shingles sort last
    and stay out of prefixes, so join fan-out is bounded by
    rare-shingle document frequencies, exactly as in
    ``ngram_jaccard_pairs``.  A size filter ``|B| ≥ t·|A|`` (the
    intersection can never exceed ``|B|``) prunes further.
    Candidates are verified EXACTLY with ``array_intersect`` over the
    full per-doc shingle arrays — no false negatives (prefix
    theorem), no false positives (exact verify).

    Output: ``doc_a, doc_b, containment`` (double) with
    ``doc_a != doc_b`` — ORDERED pairs (A contained in B), so a
    near-identical pair appears in both directions.
    """
    def _cache(df, name):
        if mat is not None:
            return mat.cache(df, name)
        df = df.persist()
        df.count()
        return df

    sarr = F.array_distinct(shingles_col(F.col("text"), shingle_n))
    sh = _cache(
        docs.select("doc_id", F.explode(sarr).alias("s")), "cont-shingles"
    )
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    from pyspark.sql import Window

    ranked = sh.join(dfreq, "s").withColumn(
        "pos", F.row_number().over(Window.partitionBy("doc_id").orderBy("df", "s"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    # A-side prefix length |A| − ⌈t·|A|⌉ + 1 (1e-9 guards float noise in
    # the safe direction: a longer prefix can only add candidates)
    pref = (
        ranked.join(sizes, "doc_id")
        .where(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz") - 1e-9) + 1
        )
        .select(
            F.col("doc_id").alias("doc_a"), "s", F.col("sz").alias("sz_a")
        )
    )
    full_b = sh.join(sizes, "doc_id").select(
        F.col("doc_id").alias("doc_b"), "s", F.col("sz").alias("sz_b")
    )
    cand = (
        pref.join(full_b, "s")
        .where(F.col("doc_a") != F.col("doc_b"))
        .where(
            F.col("sz_b").cast("double")
            >= F.lit(threshold) * F.col("sz_a").cast("double")
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    arrays = sh.groupBy("doc_id").agg(F.collect_list("s").alias("sarr"))
    return (
        cand.join(arrays.withColumnsRenamed({"doc_id": "doc_a", "sarr": "arr_a"}), "doc_a")
        .join(arrays.withColumnsRenamed({"doc_id": "doc_b", "sarr": "arr_b"}), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("arr_a", "arr_b")).cast("double")
                / F.size("arr_a").cast("double")
            ).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


# ----------------------------------------------------------------------
# content-defined chunking (round 7)
# ----------------------------------------------------------------------

CDC_BASE = 257
CDC_MOD = (1 << 31) - 1


def cdc_pows(window: int) -> list[int]:
    """``CDC_BASE**j % CDC_MOD`` for j in 0..window-1 — shared with the
    DuckDB oracle so both engines evaluate the identical polynomial."""
    return [pow(CDC_BASE, j, CDC_MOD) for j in range(window)]


def content_defined_chunks(
    docs: DataFrame, window: int = 8, divisor: int = 64
) -> DataFrame:
    """Content-defined chunking — the rolling-hash boundary rule behind
    LBFS / FastCDC-style storage and text dedup (Muthitacharoen et al.
    SOSP'01): a chunk boundary falls after character position ``p``
    wherever the polynomial hash of the last ``window`` characters ≡ 0
    (mod ``divisor``), plus a final boundary at end-of-text.  Because
    boundaries are a function of CONTENT, an insertion or deletion
    re-aligns at most the chunk it touches — fixed-size blocks would
    shift every downstream block and defeat chunk-level dedup.

    Entirely JVM higher-order expressions: per-character codes via
    ``transform``/``ascii``, per-position hashes as an ``aggregate``
    fold in fixed index order (each term reduced mod 2³¹−1 so the sum
    never leaves long range), boundary selection via ``filter`` — no
    Python, no shuffle (chunking happens in the scan stage; only the
    caller's chunk-hash aggregate moves data).  Expected chunk length
    ≈ ``divisor`` characters.

    Output: ``(doc_id, chunk_no, start, chunk_len, chunk_hash)`` —
    1-based start, 60-bit md5-derived chunk hash (``_hash60``), chunks
    in document order.
    """
    pows = F.array(*[F.lit(p).cast("long") for p in cdc_pows(window)])
    n = F.length("text")

    codes = F.transform(F.split(F.col("text"), ""), lambda c: F.ascii(c))

    def roll(cds):
        def h(p):
            return F.aggregate(
                F.sequence(F.lit(0), F.lit(window - 1)),
                F.lit(0).cast("long"),
                lambda acc, j: (
                    acc
                    + (
                        F.element_at(cds, (p - j).cast("int")).cast("long")
                        * F.element_at(pows, (j + 1).cast("int"))
                    )
                    % F.lit(CDC_MOD)
                )
                % F.lit(CDC_MOD),
            )

        bounds = F.filter(
            F.when(n >= window, F.sequence(F.lit(window).cast("long"), n))
            .otherwise(F.array().cast("array<long>")),
            lambda p: h(p) % divisor == 0,
        )
        # append end-of-text unless it is already a boundary (explicit
        # branch, NOT array_distinct — order preservation must not
        # depend on engine-specific distinct semantics)
        return F.when(
            F.array_contains(bounds, n.cast("long")), bounds
        ).otherwise(F.concat(bounds, F.array(n.cast("long"))))

    with_bounds = docs.select(
        "doc_id", "text", let_col(codes, roll).alias("bounds")
    )
    chunk = F.transform(
        F.col("bounds"),
        lambda b, i: F.struct(
            i.cast("long").alias("chunk_no"),
            F.when(i == 0, F.lit(1).cast("long"))
            .otherwise(F.element_at(F.col("bounds"), i.cast("int")) + 1)
            .alias("start"),
            b.alias("end"),
        ),
    )
    return (
        with_bounds.select("doc_id", "text", F.explode(chunk).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_no").alias("chunk_no"),
            F.col("c.start").alias("start"),
            (F.col("c.end") - F.col("c.start") + 1).alias("chunk_len"),
            _hash60(
                F.substring(
                    "text",
                    F.col("c.start").cast("int"),
                    (F.col("c.end") - F.col("c.start") + 1).cast("int"),
                )
            ).alias("chunk_hash"),
        )
    )


def cdc_chunk_dedup(
    docs: DataFrame, window: int = 8, divisor: int = 64, min_count: int = 2
) -> DataFrame:
    """Chunk-level dedup over content-defined chunks: which chunk
    contents recur, how often, and across how many documents — the
    aggregate a dedup-by-reference store (or a repeated-boilerplate
    scrubber) runs first.  ONE shuffle on chunk_hash with map-side
    partial aggregation; chunk text itself never moves."""
    ch = content_defined_chunks(docs, window, divisor)
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.min("chunk_len").cast("long").alias("chunk_len"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def cosine_dup_threshold_curve(
    emb,
    block_col: str = "label",
    thresholds: tuple = (0.2, 0.3, 0.35, 0.4, 0.5),
):
    """Near-dup census across a THRESHOLD GRID from one pair pass (the
    ``watermark_sizing`` pattern applied to embedding dedup): how many
    block-internal pairs, and how many distinct vectors, sit above each
    candidate cosine cutoff?

    The expensive part — the Σ per-block n² cosine pass of
    ``embedding_near_dups_blocked`` — runs ONCE with no threshold;
    every grid point is a conditional sum over the same scored rows,
    so answering "what would 0.4 cost instead of 0.35?" is free.  Each
    pair explodes into exactly two id rows, so n_pairs is the
    conditional row count div 2 and the distinct-vector count rides
    the same aggregate.  One wide aggregate + a ``stack`` unpivot;
    zero Python, and the only shuffles are the block join and the
    1-row aggregate.
    """
    from pyspark.sql import functions as F

    pairs = embedding_near_dups_blocked(emb, block_col, threshold=-2.0)
    ex = pairs.select(F.explode(F.array("id_a", "id_b")).alias("id"), "cosine")
    aggs = []
    for i, t in enumerate(thresholds):
        over = F.col("cosine") >= F.lit(float(t))
        # coalesce: SUM over zero rows is NULL — a block layout with no
        # same-block pair must yield a 0-count curve, not NULLs
        # (ADVICE r8; same hardening as bloom_semi_prune's empty path)
        aggs.append(
            (F.coalesce(F.sum(F.when(over, 1).otherwise(0)), F.lit(0)) / 2)
            .cast("long")
            .alias(f"np_{i}")
        )
        aggs.append(F.countDistinct(F.when(over, F.col("id"))).alias(f"nv_{i}"))
    wide = ex.agg(*aggs)
    stack = ", ".join(
        f"CAST({float(t)} AS DOUBLE), np_{i}, nv_{i}"
        for i, t in enumerate(thresholds)
    )
    return wide.selectExpr(
        f"stack({len(thresholds)}, {stack}) AS (threshold, n_pairs, n_vec_with_dup)"
    )

"""Sketch-based approximate operators with MEASURED quality contracts
(SURVEY.md §2.10 engine extensions).

At 100 TB the exact forms of distinct-count, percentile, and frequency
are shuffle-heavy or impossible (a distinct over a trillion keys);
their sketch counterparts — HyperLogLog++ (``approx_count_distinct``),
Apache DataSketches HLL (mergeable via ``hll_union_agg``) and KLL
quantiles, the ``approx_percentile`` digest, and the Count-Min
frequency sketch — are single-pass, mergeable, and bounded-memory.
All builds are JVM aggregates (no Python in any row path).

An approximate answer can't hash-match an exact oracle, so the gate
contract is the QUALITY CLAIM instead: each check computes sketch and
exact answers side by side and emits a boolean row ("within 5%",
"estimate never under-counts") — booleans the DuckDB oracle pins as
constants.  Same pattern as ``emb_ann_quality``: the artifact recorded
by the driver is the measured guarantee, not a lucky number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_within(
    df: DataFrame, col: str, rel_tol: float = 0.05, rsd: float = 0.02
) -> DataFrame:
    """One row: is HLL++ ``approx_count_distinct`` within ``rel_tol``
    of the exact distinct count?  (rsd 0.02 ⇒ ~2% expected error, so
    a 5% gate has comfortable margin at any cardinality.)"""
    agg = df.agg(
        F.countDistinct(col).cast("double").alias("exact"),
        F.approx_count_distinct(col, rsd).cast("double").alias("approx"),
    )
    return agg.select(
        F.lit(f"hll_distinct_{col}_within_{int(rel_tol * 100)}pct").alias("metric"),
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= F.lit(float(rel_tol)) * F.col("exact")
        ).alias("ok"),
    )


def percentile_within(
    df: DataFrame,
    col: str,
    q: float = 0.5,
    rel_tol: float = 0.05,
    accuracy: int = 10000,
) -> DataFrame:
    """One row: is ``approx_percentile`` within ``rel_tol`` of the
    exact percentile?  ``accuracy`` 10000 bounds rank error at 1/10000
    of the rows — far inside a 5% value gate on any non-degenerate
    distribution."""
    agg = df.agg(
        F.expr(f"percentile({col}, {q})").alias("exact"),
        F.expr(f"approx_percentile({col}, {q}, {accuracy})").cast("double").alias(
            "approx"
        ),
    )
    return agg.select(
        F.lit(f"approx_p{int(q * 100)}_{col}_within_{int(rel_tol * 100)}pct").alias(
            "metric"
        ),
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= F.lit(float(rel_tol)) * F.abs(F.col("exact"))
        ).alias("ok"),
    )


def hll_merge_within(
    df: DataFrame, col: str, group_col: str, rel_tol: float = 0.05
) -> DataFrame:
    """One row pinning the MERGEABILITY contract — the property that
    makes sketches the 100 TB answer: per-group Apache DataSketches
    HLL sketches (``hll_sketch_agg``), merged with ``hll_union_agg``,
    must estimate the GLOBAL distinct count within ``rel_tol``.

    This is exactly the two-level shape of a shard-then-combine
    pipeline (per-partition/day sketches unioned at read time) —
    the estimate never re-touches the raw data."""
    per_group = df.groupBy(group_col).agg(
        F.hll_sketch_agg(col).alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("double").alias("approx")
    )
    exact = df.agg(F.countDistinct(col).cast("double").alias("exact"))
    return merged.crossJoin(exact).select(
        F.lit(f"hll_merged_{col}_by_{group_col}_within_{int(rel_tol * 100)}pct").alias(
            "metric"
        ),
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= F.lit(float(rel_tol)) * F.col("exact")
        ).alias("ok"),
    )


def kll_quantile_within(
    df: DataFrame, col: str, q: float = 0.5, rel_tol: float = 0.05, k: int = 800
) -> DataFrame:
    """One row: the Apache DataSketches KLL quantile sketch
    (``kll_sketch_agg_double`` — mergeable, bounded-memory) must land
    within ``rel_tol`` of the exact percentile.  ``k`` 800 bounds rank
    error ≈ 0.6% — far inside a 5% value gate."""
    agg = df.agg(
        F.expr(f"percentile({col}, {q})").alias("exact"),
        F.kll_sketch_agg_double(F.col(col).cast("double"), F.lit(int(k))).alias("sk"),
    ).select(
        "exact",
        F.expr(f"kll_sketch_get_quantile_double(sk, cast({q} as double))").cast(
            "double"
        ).alias("approx"),
    )
    return agg.select(
        F.lit(f"kll_p{int(q * 100)}_{col}_within_{int(rel_tol * 100)}pct").alias(
            "metric"
        ),
        (
            F.abs(F.col("approx") - F.col("exact"))
            <= F.lit(float(rel_tol)) * F.abs(F.col("exact"))
        ).alias("ok"),
    )


def cms_heavy_hitters_within(
    df: DataFrame,
    col: str,
    k: int = 5,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """One row pinning the Count-Min sketch contract on the ``k``
    heaviest keys: every estimate must be ≥ the exact count (CMS never
    under-counts) and ≤ exact + eps·N (the one-sided error bound, held
    with probability ``confidence``).

    The sketch builds as one distributed ``count_min_sketch``
    aggregate; the probe deserializes it through Spark's public
    ``org.apache.spark.util.sketch.CountMinSketch`` and queries the
    ``k`` exact heavy hitters (a bounded top-k collect — the contract
    check, not the data path)."""
    spark = df.sparkSession
    sk = df.agg(
        F.count_min_sketch(
            col, F.lit(float(eps)), F.lit(float(confidence)), F.lit(int(seed))
        ).alias("s")
    ).first()["s"]
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk))
    )
    top = (
        df.groupBy(col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col(col).asc())
        .limit(int(k))
        .collect()
    )
    total = int(cms.totalCount())
    ok = all(
        int(r["n"]) <= cms.estimateCount(int(r[col])) <= int(r["n"]) + eps * total
        for r in top
    )
    return spark.createDataFrame(
        [(f"cms_top{int(k)}_{col}_within_eps", bool(ok))], "metric STRING, ok BOOLEAN"
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning
# ---------------------------------------------------------------------------

#: (a, b) pairs of a universal multiplicative hash family
#: pos(key) = ((key*a + b) mod P) mod m — exact BIGINT arithmetic in
#: both engines, so the filter is bit-for-bit reproducible (unlike
#: Spark's internal Murmur3-based BloomFilterImpl, which DuckDB
#: cannot replay).
_BLOOM_HASHES = ((2654435761, 97), (40503, 12345), (2246822519, 7919))
_BLOOM_PRIME = 1048573  # prime > any m we use


def _bloom_pos(key, a: int, b: int, m_bits: int):
    return ((key * F.lit(a) + F.lit(b)) % F.lit(_BLOOM_PRIME)) % F.lit(m_bits)


def bloom_semi_prune(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str = "l_suppkey",
    dim_key: str = "s_suppkey",
    m_bits: int = 1024,
) -> DataFrame:
    """Bloom-filter runtime pruning of a fact scan, with measured
    false-positive accounting (the Bloom/semi-join runtime-filter
    pattern Spark itself applies under
    ``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`` — here
    surfaced as an explicit, engine-portable operator).

    Build: the dim key set hashes through ``k=3`` universal
    multiplicative hashes into an ``m_bits``-bit bitmap held as a
    map<word → 32-bit mask> built by a ``bit_or`` aggregate — at most
    ``m_bits/32`` rows ever aggregate, and the finished filter is a
    SINGLE row (128 bytes of masks for the default 1024 bits).

    Probe: the bitmap broadcast-crossJoins onto the fact side (one
    row — the exact shape of a pushed runtime filter), each fact key
    tests its 3 bit positions with ``element_at``+``&``, and ONE
    aggregate emits the accounting row: rows scanned, true member
    rows, rows passing the filter, false positives, measured FPR in
    basis points, and bits set.

    At 100 TB the point is shuffle avoidance: the 128-byte bitmap
    travels to every scan task instead of the fact table's join key
    shuffling to a semi-join — false positives only cost downstream
    work, never correctness.  Zero Python; the only shuffles are the
    ≤``m_bits/32``-row filter build and the final 1-row aggregate.
    """
    dk = F.col(dim_key).cast("long")
    pos = dim_keys.select(
        F.explode(
            F.array(*[_bloom_pos(dk, a, b, m_bits) for a, b in _BLOOM_HASHES])
        ).alias("pos")
    ).distinct()
    words = pos.groupBy(F.expr("pos div 32").alias("word")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))")
        ).alias("mask")
    )
    bm = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("bm"),
        # empty dim set → SUM over zero rows is NULL, not 0
        F.coalesce(F.sum(F.bit_count("mask")), F.lit(0))
        .cast("long")
        .alias("n_bits_set"),
    ).persist()  # read by TWO broadcasts below (probe + accounting row);
    # without the cache the dim scan + distinct + group-by subplan
    # executes twice per run (ADVICE r8).  One cached row (~128 bytes).
    member = (
        dim_keys.select(dk.alias("k")).distinct().withColumn("m", F.lit(1))
    )
    fk = F.col(fact_key).cast("long")
    probe = (
        fact.select(
            fk.alias("k"),
            *[
                _bloom_pos(fk, a, b, m_bits).alias(f"p{i}")
                for i, (a, b) in enumerate(_BLOOM_HASHES)
            ],
        )
        .join(F.broadcast(member), "k", "left")
        .crossJoin(F.broadcast(bm))
    )

    def _bit_ok(p: str):
        mask = F.coalesce(
            F.element_at(F.col("bm"), F.expr(f"{p} div 32")), F.lit(0).cast("long")
        )
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({p} % 32 AS INT))")
        return mask.bitwiseAND(bit) != 0

    is_member = F.col("m").isNotNull()
    passed = _bit_ok("p0") & _bit_ok("p1") & _bit_ok("p2")
    # an empty fact side empties the crossJoin too, so every SUM/FIRST
    # below needs a 0 default for the degenerate-input row
    zero = F.lit(0).cast("long")
    agg = probe.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.coalesce(F.sum(F.when(is_member, 1).otherwise(0)), zero)
        .cast("long")
        .alias("n_member_rows"),
        F.coalesce(F.sum(F.when(passed, 1).otherwise(0)), zero)
        .cast("long")
        .alias("n_pass"),
        F.coalesce(F.sum(F.when(passed & ~is_member, 1).otherwise(0)), zero)
        .cast("long")
        .alias("n_false_pos"),
    )
    # n_bits_set is a property of the FILTER, not the probe stream —
    # joined onto the 1-row accounting so it survives an empty fact
    return agg.crossJoin(F.broadcast(bm.select("n_bits_set"))).select(
        "n_rows",
        "n_member_rows",
        "n_pass",
        "n_false_pos",
        F.expr(
            "(n_false_pos * 10000) div greatest(n_rows - n_member_rows, 1)"
        ).alias("fpr_bp"),
        "n_bits_set",
    )


# ---------------------------------------------------------------------------
# Engine-portable Count-Min sketch (explicit universal hashes)
# ---------------------------------------------------------------------------

#: (a, b) rows of the CMS hash family — same construction as
#: ``_BLOOM_HASHES`` but with the Mersenne prime 2^31−1, so
#: ``((key % P) * a + b) % P`` stays inside int64 for ANY long key
#: ((2^31)·(2^31) < 2^63) and both engines replay the sketch
#: bit-for-bit.  Spark's builtin ``count_min_sketch`` (see
#: ``cms_heavy_hitters_within`` above) hashes with Murmur3 that DuckDB
#: cannot reproduce — this variant trades two multiplications per key
#: for a fully differential-testable sketch.
_CMS_HASHES = ((2654435761, 97), (40503, 12345), (2246822519, 7919), (1366127, 101159))
_CMS_PRIME = 2147483647  # 2^31 − 1


def _cms_bucket(key, a: int, b: int, width: int):
    return (((key % F.lit(_CMS_PRIME)) * F.lit(a) + F.lit(b)) % F.lit(_CMS_PRIME)) % F.lit(width)


def cms_portable_topk(
    df: DataFrame, col: str, k: int = 20, width: int = 128
) -> DataFrame:
    """Count-Min heavy-hitter audit: exact count vs CMS estimate for
    the ``k`` heaviest keys of ``col`` (non-negative integral keys).

    Build: ONE pass over the rows — each key explodes into ``d=4``
    ``(row, bucket)`` pairs and a single aggregate yields the whole
    sketch (≤ ``4·width`` counter rows; 512 for the default — always
    broadcastable, mergeable across partitions/streams by addition,
    the properties that make CMS the 100 TB frequency structure).
    Probe: the exact top-k (the audit baseline, not the data path)
    joins the broadcast sketch on its 4 bucket positions; the estimate
    is the row-wise MIN.

    Output: ``(key, exact_n, cms_n, overcount)`` — CMS never
    under-counts, so ``overcount ≥ 0`` always, and E[overcount] ≤
    N/width per hash row (Cormode & Muthukrishnan 2005), minimized
    over the 4 rows.  Every number is exact int64 arithmetic —
    hash-comparable against a DuckDB replay of the same hashes.
    """
    key = F.col(col).cast("long")
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), _cms_bucket(key, a, b, width).alias("bucket")
            )
            for i, (a, b) in enumerate(_CMS_HASHES)
        ]
    )
    sketch = (
        df.select(F.explode(pairs).alias("e"))
        .groupBy(F.col("e.i").alias("i"), F.col("e.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    top = (
        df.groupBy(key.alias("key"))
        .agg(F.count("*").cast("long").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("key").asc())
        .limit(int(k))
    )
    tk = F.col("key")
    probes = top.select(
        "key",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_bucket(tk, a, b, width).alias("bucket"),
                    )
                    for i, (a, b) in enumerate(_CMS_HASHES)
                ]
            )
        ).alias("e"),
    ).select("key", "exact_n", F.col("e.i").alias("i"), F.col("e.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("key", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
        .select(
            "key",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# Engine-portable HyperLogLog (explicit universal hash, dyadic-exact sums)
# ---------------------------------------------------------------------------

#: single (a, b) universal hash for the HLL register stream — same
#: Mersenne-prime construction as ``_CMS_HASHES``: h(key) =
#: ((key % P)·a + b) % P is a 31-bit value both engines compute in
#: exact int64 arithmetic, so every register is bit-reproducible
#: (Spark's builtin ``approx_count_distinct`` HLL++ hashes with
#: xxHash64 that DuckDB cannot replay — see ``distinct_within`` for
#: that variant's quality-contract gate).
_HLL_A, _HLL_B = 1103515245, 12345

#: alpha_m bias constants (Flajolet et al. 2007, Fig. 3)
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_portable(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    """Engine-portable HyperLogLog distinct-count sketch over a
    non-negative integral column: ``m = 2^p`` max-rank registers from
    an explicit universal hash, plus the raw HLL estimate audited
    against the exact distinct count.

    Register split of the 31-bit hash: low ``p`` bits pick the
    register, the remaining ``31−p`` bits supply the rank
    (leading-zero count + 1, via ``length(bin(w))`` — pure integer in
    both engines).  Registers merge by MAX — the property that makes
    HLL the 100 TB distinct structure: per-partition (or per-day,
    per-shard) register sets combine map-side, the shuffle carries at
    most ``m`` rows per partition, and the raw estimate
    ``α_m·m²/Σ2^−M`` never re-touches the data.

    Every output value is hash-comparable at FULL precision: the
    ``2^−M`` terms are dyadic rationals built as ``1.0 /
    shiftleft(1, M)`` (exact in IEEE754, no ``pow`` libm variance),
    their ≤ m-term sum spans < 53 bits so ANY summation order is
    exact, and the single α·m²/S division is deterministic IEEE — so
    the estimate needs no rounding.  The raw estimator is emitted
    as-is (no small-range linear-counting branch — ``ln`` libm
    variance would break bit-parity; ``n_zero_regs`` is emitted so a
    consumer can apply the correction downstream).

    Output: one row per NON-EMPTY register ``(register, max_rank)``
    crossed with the one-row audit ``(m, n_zero_regs, n_exact,
    hll_est, err_bp)``.
    """
    m = 1 << p
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))
    key = F.col(col).cast("long")
    h = ((key % _CMS_PRIME) * F.lit(_HLL_A) + F.lit(_HLL_B)) % F.lit(_CMS_PRIME)
    width = 31 - p  # rank bits
    # two-step select so the hash evaluates once per row
    regs = df.select(h.alias("_h")).select(
        (F.col("_h") % m).alias("register"),
        F.expr(f"_h div {m}").alias("_w"),
    ).select(
        "register",
        F.when(F.col("_w") == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin("_w")))
        .cast("long")
        .alias("rank"),
    )
    by_reg = regs.groupBy("register").agg(F.max("rank").alias("max_rank"))
    term = F.lit(1.0) / F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(max_rank AS INT)) AS DOUBLE)"
    )
    summary = by_reg.agg(
        F.count("*").cast("long").alias("_n_set"),
        F.sum(term).alias("_s_set"),
    ).select(
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("_n_set")).cast("long").alias("n_zero_regs"),
        (
            F.lit(float(alpha * m * m))
            / (F.col("_s_set") + (F.lit(m) - F.col("_n_set")).cast("double"))
        ).alias("hll_est"),
    )
    exact = df.agg(F.countDistinct(col).cast("long").alias("n_exact"))
    audit = summary.crossJoin(exact).select(
        "m",
        "n_zero_regs",
        "n_exact",
        "hll_est",
        F.expr(
            "CAST(floor(abs(hll_est - n_exact) * 10000.0 "
            "/ greatest(n_exact, 1)) AS BIGINT)"
        ).alias("err_bp"),
    )
    return by_reg.crossJoin(F.broadcast(audit))


def hll_by_group(
    df: DataFrame, col: str, group_cols: list[str], p: int = 6
) -> DataFrame:
    """Per-group engine-portable HLL estimates — the shape the sketch
    exists for at 100 TB: one pass builds every group's ``m = 2^p``
    registers simultaneously (ONE ``(group, register)`` aggregate with
    map-side combine; the shuffle carries ≤ m rows per group per
    partition), then a per-group fold yields the raw estimate.  A
    per-group exact ``countDistinct`` rides along as the audit
    baseline (the check, not the data path — at scale you'd drop it).

    Same bit-reproducibility argument as :func:`hll_portable` (single
    universal hash, dyadic-exact ``1/shiftleft`` terms, no libm).
    Output: one row per group ``(<group cols>, n_exact, hll_est,
    err_bp)``.
    """
    m = 1 << p
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))
    width = 31 - p
    key = F.col(col).cast("long")
    h = ((key % _CMS_PRIME) * F.lit(_HLL_A) + F.lit(_HLL_B)) % F.lit(_CMS_PRIME)
    regs = df.select(*group_cols, h.alias("_h")).select(
        *group_cols,
        (F.col("_h") % m).alias("register"),
        F.expr(f"_h div {m}").alias("_w"),
    ).select(
        *group_cols,
        "register",
        F.when(F.col("_w") == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin("_w")))
        .cast("long")
        .alias("rank"),
    )
    by_reg = regs.groupBy(*group_cols, "register").agg(
        F.max("rank").alias("max_rank")
    )
    term = F.lit(1.0) / F.expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(max_rank AS INT)) AS DOUBLE)"
    )
    est = by_reg.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("_n_set"),
        F.sum(term).alias("_s_set"),
    ).select(
        *group_cols,
        (
            F.lit(float(alpha * m * m))
            / (F.col("_s_set") + (F.lit(m) - F.col("_n_set")).cast("double"))
        ).alias("hll_est"),
    )
    exact = df.groupBy(*group_cols).agg(
        F.countDistinct(col).cast("long").alias("n_exact")
    )
    return est.join(exact, group_cols).select(
        *group_cols,
        "n_exact",
        "hll_est",
        F.expr(
            "CAST(floor(abs(hll_est - n_exact) * 10000.0 "
            "/ greatest(n_exact, 1)) AS BIGINT)"
        ).alias("err_bp"),
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    n_bins: int = 256,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable equi-width-histogram quantiles — the engine-portable
    complement to the KLL quality contract (``kll_quantile_within``):
    bin counts ADD across partitions/shards/days *that share the same
    global (lo, hi) bounds* — histograms built independently on shards
    with different min/max have incompatible bin edges and cannot be
    merged by addition (ADVICE r9).  Within one invocation that
    precondition holds by construction (the bounds pass runs over the
    full input first); a multi-day 100 TB rollup gets it by fixing the
    bounds a priori or from a first bounds-only pass, then the
    histogram is a ≤``n_bins``-row mergeable state and the quantile
    read never re-touches the data.

    One (min, max, count) pass broadcasts as a 1-row bound; binning is
    a pure projection (``floor((x − lo)/w)``, top bin clamped); the
    quantile answer for each ``q`` is the first bin whose cumulative
    count reaches ``q·n`` — rank error ≤ one bin width by
    construction.  Every float op (the single width division, the
    per-row bin, the bin edges) is deterministic IEEE on identical
    inputs, so the output hash-matches a SQL replay with no rounding.

    Output: one row per ``q`` — ``(q, bin, bin_lo, bin_hi, cum_n,
    n)``; a constant column (min == max) degenerates to bin 0 with
    width 0.  Empty/all-NULL input emits no rows.
    """
    v = F.col(col).cast("double")
    stats = df.where(v.isNotNull()).agg(
        F.min(v).alias("_lo"),
        F.max(v).alias("_hi"),
        F.count(v).cast("long").alias("n"),
    ).where(F.col("n") > 0).persist()
    # ^ one cached row, read by TWO broadcasts (binning + the quantile
    # threshold join) — without the cache the raw min/max scan would
    # execute twice (the bloom_semi_prune ADVICE r8 pattern).  The
    # 1-row cache is never explicitly unpersisted (the consumer is the
    # returned lazy DataFrame): deliberate — it is bytes, and LRU
    # eviction reclaims it in long sessions (ADVICE r9)
    w = F.when(F.col("_hi") == F.col("_lo"), F.lit(0.0)).otherwise(
        (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    )
    binned = df.where(v.isNotNull()).crossJoin(F.broadcast(stats)).select(
        F.when(w == 0.0, F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor((v - F.col("_lo")) / w), F.lit(n_bins - 1).cast("long")
            )
        )
        .alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count("*").cast("long").alias("k"))
    from pyspark.sql import Window

    cum = hist.withColumn(
        "cum_n",
        F.sum("k").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    qdf = F.broadcast(
        df.sparkSession.range(1).select(
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
        )
    )
    hit = (
        cum.crossJoin(qdf)
        .crossJoin(F.broadcast(stats))
        .where(F.col("cum_n").cast("double") >= F.col("q") * F.col("n").cast("double"))
    )
    first = hit.withColumn(
        "_rn", F.row_number().over(Window.partitionBy("q").orderBy("bin"))
    ).where(F.col("_rn") == 1)
    return first.select(
        "q",
        "bin",
        (F.col("_lo") + F.col("bin").cast("double") * w).alias("bin_lo"),
        (F.col("_lo") + (F.col("bin") + 1).cast("double") * w).alias("bin_hi"),
        F.col("cum_n").cast("long").alias("cum_n"),
        "n",
    )

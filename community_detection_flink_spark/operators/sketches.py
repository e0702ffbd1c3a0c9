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

"""Data-layout effectiveness operators (engine extension).

At 100 TB the cheapest I/O is the I/O you never do: lakehouse tables
are pruned by per-file min/max statistics, and HOW rows are assigned
to files decides whether a multi-dimensional predicate skips 90% of
them or none.  Z-ordering (bit-interleaving the sort key across
dimensions — the Delta/Iceberg ``ZORDER BY`` primitive) keeps every
file's bounding box small in EVERY dimension, where a linear sort
keeps it small in one.

``zorder_pruning_stats`` makes that measurable and oracle-exact: it
computes the would-be file assignment under both layouts with pure
integer arithmetic (no actual rewrite — the measurement is one scan +
one aggregate) and reports how many files a 2-D box predicate touches
under each.  The interleave expression is GENERATED once and shared
verbatim with the DuckDB oracle (only the integer-division token
differs per dialect), so the engine claim is hash-certified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def z_interleave_sql(x: str, y: str, bits: int, div: str) -> str:
    """Bit-interleave SQL for two ``bits``-bit non-negative ints —
    pure div/mod/multiply/add so the SAME text (modulo the integer
    division token: Spark ``div``, DuckDB ``//``) is exact in both
    engines.  ``x`` supplies even output bits, ``y`` odd."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} {div} {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({y} {div} {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def zorder_pruning_stats(
    orders: DataFrame,
    n_buckets: int = 16,
    x_lo: int = 0,
    x_hi: int = 127,
    y_lo: int = 16,
    y_hi: int = 47,
) -> DataFrame:
    """File-pruning effectiveness of Z-order vs linear layout for a
    2-D box predicate, in one row.

    Dimensions: ``x`` = ``o_custkey % 256``, ``y`` = epoch-day of
    ``o_orderdate % 256`` (two 8-bit keys → a 16-bit z-value).  The
    table would land as ``n_buckets`` equal z-ranges (Z-order layout)
    or ``n_buckets`` equal x-ranges (the linear single-key layout).
    For the box ``x ∈ [x_lo,x_hi] ∧ y ∈ [y_lo,y_hi]`` the row reports
    how many of each layout's files contain at least one matching row
    — exactly the files a min/max-stats reader must open.

    With the defaults (the x-halfspace ∧ one y-octave), Z-order
    touches the files whose leading interleaved bits match BOTH
    constraints while the linear layout is blind to ``y`` — the
    measured gap is the ZORDER BY sales pitch as a certified number.
    One scan, one aggregate, two conditional distinct counts; zero
    joins, zero Python.
    """
    z_bucket_width = (1 << 16) // n_buckets
    x_bucket_width = 256 // n_buckets
    d = orders.selectExpr(
        "o_custkey % 256 AS x",
        "unix_date(CAST(o_orderdate AS DATE)) % 256 AS y",
    ).selectExpr(
        "x",
        "y",
        f"{z_interleave_sql('x', 'y', 8, 'div')} AS z",
    )
    match = (
        (F.col("x") >= x_lo)
        & (F.col("x") <= x_hi)
        & (F.col("y") >= y_lo)
        & (F.col("y") <= y_hi)
    )
    return d.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(match, 1).otherwise(0)).cast("long").alias("n_match"),
        F.countDistinct(F.when(match, F.expr(f"z div {z_bucket_width}")))
        .cast("long")
        .alias("zorder_files_touched"),
        F.countDistinct(F.when(match, F.expr(f"x div {x_bucket_width}")))
        .cast("long")
        .alias("linear_files_touched"),
    ).withColumn("n_files", F.lit(int(n_buckets)).cast("long"))

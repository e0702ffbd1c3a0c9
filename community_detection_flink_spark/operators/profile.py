"""Data profiling (engine extension): per-column table statistics.

The operational front door of any analytics engine over a new dataset:
null counts, distinct cardinality, min/max per column — ONE pass over
the table (every per-column aggregate rides the same scan; Catalyst
fuses them into a single hash-aggregate), plus an approximate variant
whose distinct counts come from HLL sketches (`approx_count_distinct`)
for the 100 TB path where exact distincts would shuffle every value.

Output is long-form — one row per column — so the result is joinable
and engine-comparable (min/max rendered as strings; exact formatting
matters only for the oracle, which mirrors it).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, approx: bool = False) -> DataFrame:
    """``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``
    per column.  ``approx=True`` swaps exact distincts for HLL
    (`approx_count_distinct`) — the only piece whose exact form cannot
    scale (it shuffles every distinct value).

    One wide aggregation: all 4·n_cols aggregates are computed in a
    single pass/scan, then unpivoted driver-free via a stack.
    """
    cols = df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.when(col.isNull(), 1)).cast("long").alias(f"{c}__nulls"),
            (
                F.approx_count_distinct(c) if approx else F.countDistinct(c)
            ).cast("long").alias(f"{c}__distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(F.count(F.lit(1)).cast("long").alias("__rows"), *aggs)

    # unpivot: stack(n, 'col1', nulls1, distinct1, min1, max1, ...)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'",
            f"`{c}__nulls`",
            f"`{c}__distinct`",
            f"`{c}__min`",
            f"`{c}__max`",
        ]
    stacked = wide.select(
        "__rows",
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column",
        F.col("__rows").alias("n_rows"),
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
    )

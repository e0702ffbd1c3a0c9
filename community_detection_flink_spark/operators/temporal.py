"""Temporal joins: as-of join and bucketed range join.

The reference engine has no temporal-join operator; these are part of the
training-data-pipeline surface (aligning events with the latest prior
state: model snapshots, feature values, consent records, ...).

Both operators are expressed so the physical plan is the one you'd want
at 100 TB:

* ``asof_join`` is the classic *merge as-of*: union both sides with a
  side tag, ONE shuffle on the key, one in-partition sort on
  ``(time, side)``, then a running ``last(..., ignorenulls=True)``
  window carries the most recent right-side payload forward onto left
  rows.  No range-explosion, no per-key ``collect_list``, no broadcast
  requirement; skew is bounded by per-key row counts exactly like any
  keyed window.  (Equivalent to pandas ``merge_asof`` semantics,
  direction="backward", allow_exact_matches=True.)

* ``range_count_join`` handles the *no-equi-key* range join (every left
  row vs every right row within a time band) by bucketing both sides to
  the band width: each right row lands in one bucket, each left row
  probes its own bucket and the previous one, and the band predicate is
  re-checked exactly after the equi-join on the bucket id.  Fan-out per
  left row is the rows in ≤2 buckets — the standard way to keep a band
  join off the cartesian path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_count_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str = "ts",
    right_time: str = "ts",
    how: str = "inner",
    tolerance_seconds: float | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[right_time] <= left[left_time]`` and the same ``on`` key.

    Every right column except the key is attached, renamed
    ``{right_prefix}{col}`` (the matched time arrives as
    ``{right_prefix}{right_time}``).  ``how`` is ``inner`` (drop left
    rows with no prior right row) or ``left`` (keep them, NULL payload).
    ``tolerance_seconds`` additionally requires
    ``left_time - matched_time <= tolerance`` (matches outside the
    window are dropped/NULLed like a missing match).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    payload = [c for c in right.columns if c != on]
    out_payload = [right_prefix + c for c in payload]
    overlap = set(out_payload) & set(left.columns)
    if overlap:
        raise ValueError(f"prefixed right columns collide with left: {overlap}")

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(o)
          for c, o in zip(payload, out_payload)],
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
        *[F.col(c).alias(o) for c, o in zip(payload, out_payload)],
    )
    # right rows sort BEFORE left rows at equal time, so an exact
    # timestamp match is visible to the left row (>= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[F.last(o, ignorenulls=True).over(w).alias("_c_" + o) for o in out_payload],
    )
    matched_time = F.col("_c_" + right_prefix + right_time)
    out = carried.where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("_t").cast("double") - matched_time.cast("double")
            <= F.lit(float(tolerance_seconds))
        )
        out = out.select(
            *left.columns,
            *[F.when(in_tol, F.col("_c_" + o)).alias(o) for o in out_payload],
        )
    else:
        out = out.select(
            *left.columns, *[F.col("_c_" + o).alias(o) for o in out_payload]
        )
    if how == "inner":
        out = out.where(F.col(right_prefix + right_time).isNotNull())
    return out


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str = "ts",
    right_time: str = "ts",
    band_seconds: int = 3600,
    count_name: str = "n_in_band",
) -> DataFrame:
    """Per left row: COUNT of right rows with
    ``left_time - band < right_time <= left_time`` — with NO equi key.

    Bucket both sides by ``band_seconds``: a right row in bucket ``b``
    can only band-match left rows in buckets ``b`` and ``b+1``, so the
    right side is pre-aggregated per bucket ... except the exact band
    predicate cuts across a bucket, so right rows join at row grain on
    ``bucket IN (b, b+1)`` (explode factor exactly 2) and the predicate
    is re-applied before the final count.  Shuffle key is the bucket id
    — time-uniform data spreads evenly; a hot bucket is a genuine
    hotspot, not an artifact of the plan.
    """
    # exact integer microsecond arithmetic (no float boundary effects)
    band_us = int(band_seconds) * 1_000_000
    bucket = lambda c: F.floor(F.unix_micros(F.col(c)) / band_us)  # noqa: E731
    l_b = left.select(
        *left.columns, bucket(left_time).alias("_lb")
    )
    r_b = (
        right.select(F.col(right_time).alias("_rt"), bucket(right_time).alias("_b"))
        .select("_rt", F.explode(F.array(F.col("_b"), F.col("_b") + 1)).alias("_lb"))
    )
    lt = F.unix_micros(F.col(left_time))
    rt = F.unix_micros(F.col("_rt"))
    in_band = (rt <= lt) & (rt > lt - band_us)
    # band predicate goes in the AGGREGATE, not a where: a left row whose
    # bucket-mates all miss the band must still appear with count 0
    return (
        l_b.join(r_b, "_lb", "left")
        .groupBy(*left.columns)
        .agg(F.count(F.when(in_band, F.lit(1))).alias(count_name))
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Greedy earliest-match conversion funnel (the windowFunnel
    semantics popularized by ClickHouse): per user, t₁ = earliest
    step-1 event; tᵢ = earliest step-i event STRICTLY after tᵢ₋₁ and
    within ``within_seconds`` of t₁.  Users with no step-1 event are
    absent; reaching step i fixes tᵢ even if a later choice of tᵢ₋₁
    would have allowed more steps (greedy is the standard, and the
    deterministic, contract).

    Output: ``user, t_1 .. t_k (nullable), reached (long), converted``.

    Plan shape: one filtered min-aggregate per step, chained by k−1
    joins all keyed on the user — one user-hash exchange that AQE
    reuses across the chain, each step's aggregate pre-shuffled by the
    same key.  No windows over full event history, no per-user UDF:
    at 100 TB each step touches only its own event-type partition
    (pushed filter) and the per-user state is k timestamps.
    """
    u = F.col(user_col)
    within = F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(u.alias("user"))
        .agg(F.min(ts_col).alias("t_1"))
        .withColumn("deadline", F.col("t_1") + within)
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.where(F.col(type_col) == step).select(
            u.alias("user"), F.col(ts_col).alias("_ts")
        )
        # conditional min, NOT a row filter: a user whose step-i events
        # all fall outside the window must surface with t_i = NULL, not
        # vanish (min skips the NULLed-out invalid rows)
        valid = F.when(
            (F.col("_ts") > F.col(f"t_{i-1}")) & (F.col("_ts") <= F.col("deadline")),
            F.col("_ts"),
        )
        cur = (
            cur.join(nxt, "user", "left")
            .groupBy("user", *[f"t_{j}" for j in range(1, i)], "deadline")
            .agg(F.min(valid).alias(f"t_{i}"))
        )
    reached = F.lit(1)
    for i in range(2, len(steps) + 1):
        reached = reached + F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
    # reached is monotone: t_i is NULL whenever t_{i-1} is (its join
    # predicate references t_{i-1}), so the sum counts a prefix
    return cur.select(
        "user",
        *[f"t_{i}" for i in range(1, len(steps) + 1)],
        reached.cast("long").alias("reached"),
        F.col(f"t_{len(steps)}").isNotNull().alias("converted"),
    )

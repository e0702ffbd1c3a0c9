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

__all__ = [
    "asof_join",
    "range_count_join",
    "funnel",
    "retention_cohorts",
    "scd2_history",
    "zscore_anomalies",
    "transition_counts",
]


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


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention-cohort triangle over an event stream.

    Cohort = ISO week (Monday-truncated) of a user's FIRST event;
    output one row per (cohort_week, week_offset) with the count of
    distinct cohort users active ``week_offset`` weeks after their
    cohort week (offset 0 = the cohort week itself, so its count is
    the cohort size).

    Output: ``cohort_week (date), week_offset (long), n_users (long)``.

    Plan shape: one user-keyed min-aggregate (cohort assignment), one
    distinct over (user, activity-week) — both combiner-friendly — and
    a final small aggregate; the cohort map joins back user-keyed, so
    AQE reuses the user-hash exchange.  Nothing is ever per-user on
    the driver, and the result is O(weeks²) rows regardless of input
    size — the right output contract at 100 TB.
    """
    u = F.col(user_col)
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    cohorts = events.groupBy(u.alias("user")).agg(
        F.min(week).alias("cohort_week")
    )
    active = events.select(u.alias("user"), week.alias("act_week")).distinct()
    return (
        active.join(cohorts, "user")
        .groupBy(
            "cohort_week",
            (F.datediff("act_week", "cohort_week") / 7).cast("long").alias(
                "week_offset"
            ),
        )
        # `active` is distinct per (user, act_week) and offset is a
        # function of act_week given the cohort, so count(*) here IS
        # the distinct-user count — no second dedup pass needed
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def scd2_history(
    updates: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an update stream.

    Collapses consecutive updates with identical ``attr_cols`` into
    one validity interval per (key, attribute-state run):
    ``key, <attrs>, valid_from, valid_to (NULL = current), is_current``.

    ``tiebreak_col`` totalizes the per-key order when ``ts_col`` has
    duplicates (required for a deterministic result — pass the update
    id).  The change test is null-safe (``<=>``), so NULL → value and
    value → NULL transitions open new intervals too.

    Plan shape: two window passes over the SAME (key, order) sort —
    lag() to find change points, then lead() over the surviving change
    rows for interval ends — one shuffle keyed by ``key``; skewed keys
    are bounded by each key's update count, and at warehouse scale the
    update stream is already date-partitioned so the window partition
    never exceeds a key's history.  This is the standard
    dimension-build the reference has no equivalent for (engine
    extension, SURVEY §2.10).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.lag(ts_col).over(w).isNull()
    runs = updates.withColumn("_chg", first | changed).where(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return runs.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def zscore_anomalies(
    events: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    threshold: float = 3.0,
) -> DataFrame:
    """Events whose value is a per-group z-score outlier (|z| > t).

    Output: ``event_id, <group>, <value>, z`` (rounded to 6) for every
    flagged event.  Group statistics come from one combiner-friendly
    aggregate broadcast back onto the stream — never a window over the
    full partition, so a 100 TB group costs one pass + one tiny join.
    Sample stddev; groups with fewer than 2 rows or zero variance
    produce no flags (``try_divide`` → NULL → filtered).
    """
    stats = F.broadcast(
        events.groupBy(group_col).agg(
            F.avg(value_col).alias("_mu"),
            F.stddev_samp(value_col).alias("_sigma"),
        )
    )
    z = F.try_divide(F.col(value_col) - F.col("_mu"), F.col("_sigma"))
    return (
        events.join(stats, group_col)
        .withColumn("z", F.round(z, 6))
        .where(F.abs(F.col("z")) > threshold)
        .select("event_id", group_col, value_col, "z")
    )


def transition_counts(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user event-type transition matrix (Markov-chain estimate):
    for each ordered pair of consecutive events within a user stream,
    count the ``from_type → to_type`` transition and its conditional
    probability among all transitions leaving ``from_type``.

    One keyed window (same shuffle as any per-user sessionization) +
    one tiny aggregate; the matrix is |types|² rows regardless of
    input size.  Counts are integers and the probability is a single
    int/int division, so the result is bit-exact (oracle-hashable).
    ``id_col`` breaks timestamp ties deterministically.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = events.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
    total = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.try_divide(
            F.col("n").cast("double"), F.sum("n").over(total).cast("double")
        ).alias("p"),
    )

def sequence_pattern_matches(
    events: DataFrame,
    pattern: str,
    type_chars: dict[str, str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """CEP-style STRICT-CONTIGUITY pattern matching over each user's
    event-type sequence (MATCH_RECOGNIZE / Flink-CEP ``next()``
    semantics — no events may intervene between pattern steps, the
    complement of ``funnel``'s skip-till-next-match semantics).

    Each event type is encoded as one character (``type_chars``), the
    per-user event stream is ordered by ``(ts, event_id)`` (total
    order — ties are deterministic) and folded into one string, and
    ``pattern`` (a regex over the type alphabet, e.g. ``v+c+p``) is
    counted with standard leftmost non-overlapping scan semantics.

    Scale shape: ONE shuffle on ``hash(user_id)`` into a sort-agg
    (``sort_array`` over ``collect_list`` of (ts, id, char) structs),
    then per-row regex — all JVM built-ins, no Python, no self-join.
    Per-user sequences are bounded by per-user event counts (the same
    bound every keyed window in this module already carries); a user
    whose history exceeds memory would need session-chunking upstream,
    not a different operator.

    Output: ``user_id, seq_len, n_matches`` for users with ≥1 match.
    """
    enc = F.col(type_col)
    # fold the type→char mapping into one chained when() expression
    expr = None
    for t, ch in sorted(type_chars.items()):
        expr = (
            F.when(enc == t, ch) if expr is None else expr.when(enc == t, ch)
        )
    expr = expr.otherwise("_")
    rows = events.select(
        F.col(user_col).alias("user_id"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("eid"),
            expr.alias("ch"),
        ).alias("r"),
    )
    seqs = rows.groupBy("user_id").agg(
        F.concat_ws(
            "", F.transform(F.sort_array(F.collect_list("r")), lambda s: s["ch"])
        ).alias("seq")
    )
    return (
        seqs.select(
            "user_id",
            F.length("seq").cast("long").alias("seq_len"),
            F.size(F.regexp_extract_all("seq", F.lit(pattern), F.lit(0)))
            .cast("long")
            .alias("n_matches"),
        )
        .where(F.col("n_matches") > 0)
    )


def resample_ffill(
    events: DataFrame,
    max_user: int = 50,
) -> DataFrame:
    """Time-series resampling to a regular DAILY grid with forward
    fill (round 7) — the gap-filling every metrics warehouse and
    feature store needs before joining event streams to calendar-keyed
    facts (`date_spine` in dbt, `time_bucket_gapfill` in Timescale).

    Per user: a day slot exists for every day in [first event day,
    last event day]; each slot carries the value of the LAST event at
    or before it (deterministic last = struct-max over (ts, event_id),
    forward-filled with ``last(..., ignorenulls)`` over the day
    order).  One per-(user, day) aggregate + one explode of the
    per-user day span + one user-keyed window — grid rows are ~span,
    never |events|².

    ``max_user`` bounds the demo output; at scale the same plan runs
    per partition-pruned user range.  Output: ``(user_id, day_s,
    value_ffill)`` with day_s epoch seconds.
    """
    ev = events.where(F.col("user_id") < max_user)
    # DATE-typed spine: to_date + a DATE sequence steps whole calendar
    # days without DST hiccups, and day_s is derived from unix_date
    # (days-since-epoch).  to_date(ts) on a TIMESTAMP_LTZ column still
    # buckets in the SESSION timezone, which get_spark pins to UTC —
    # under UTC sessions the output matches the oracle's
    # naive-timestamp generate_series exactly.
    day = F.to_date(F.col("ts"))
    daily_last = (
        ev.groupBy("user_id", day.alias("day"))
        .agg(F.max(F.struct("ts", "event_id", "value")).alias("_m"))
        .select("user_id", "day", F.col("_m.value").alias("_v"))
    )
    span = ev.groupBy("user_id").agg(
        F.min(day).alias("_a"), F.max(day).alias("_b")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("_a", "_b", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily_last, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("_v", ignorenulls=True).over(w).alias("value_ffill"),
        )
        .select(
            "user_id",
            F.expr("CAST(unix_date(day) AS BIGINT) * 86400").alias("day_s"),
            "value_ffill",
        )
    )


def last_touch_attribution(
    events: DataFrame,
    window_days: int = 7,
) -> DataFrame:
    """Last-touch conversion attribution (round 7): every ``purchase``
    event is credited to the user's most recent PRECEDING
    non-purchase event within ``window_days`` — the standard
    marketing-attribution join, expressed as one user-keyed analytic
    window instead of an event×event self-join.

    The "most recent preceding" is a struct-MAX over (ts, event_id,
    event_type) on a ``ROWS … 1 PRECEDING`` frame — MAX (not LAST) so
    the semantics are an order-free aggregate both engines define
    identically.  Purchases with no touch inside the window attribute
    to ``'none'``.  Output: ``(event_id, user_id, channel, lag_s)``
    with lag_s NULL for unattributed purchases.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.max(
        F.when(
            F.col("event_type") != "purchase",
            F.struct("ts", "event_id", "event_type"),
        )
    ).over(w)
    lag_us = F.unix_micros("ts") - F.unix_micros(F.col("_t.ts"))
    in_window = lag_us <= F.lit(window_days * 86400 * 1_000_000)
    return (
        events.select("event_id", "user_id", "event_type", "ts", touch.alias("_t"))
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.when(
                F.col("_t").isNotNull() & in_window, F.col("_t.event_type")
            )
            .otherwise("none")
            .alias("channel"),
            F.when(
                F.col("_t").isNotNull() & in_window,
                F.expr(
                    "(unix_micros(ts) - unix_micros(_t.ts)) div 1000000"
                ),
            ).alias("lag_s"),
        )
    )


def heartbeat_gaps(
    events: DataFrame, threshold_minutes: int = 30
) -> DataFrame:
    """Per-user heartbeat/gap audit (round 8): the SLA data-quality
    summary an event pipeline runs to find silent users/devices —
    consecutive-event gaps per user, counted against a threshold.

    One user-keyed analytic window (lag over the SAME sort the other
    per-user windows use) + one aggregate: gaps never materialize as
    a self-join.  Integral-µs arithmetic end-to-end, so the summary is
    oracle-exact.  Output: ``(user_id, n_events, n_gaps_over,
    max_gap_s)`` with ``max_gap_s`` 0 for single-event users.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return (
        events.select("user_id", gap.alias("_gap_us"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            # count(when(...)) not sum(cast(...)): a single-event user
            # has only a NULL gap, and SUM over all-NULL is NULL while
            # the contract (and the oracle) says 0
            F.count(
                F.when(
                    F.col("_gap_us") > threshold_minutes * 60 * 1_000_000,
                    F.lit(1),
                )
            )
            .cast("long")
            .alias("n_gaps_over"),
            F.expr(
                "greatest(coalesce(max(_gap_us), 0L), 0L) div 1000000"
            ).alias("max_gap_s"),
        )
    )


def ohlc_bars(events: DataFrame, bucket_s: int = 3600) -> DataFrame:
    """OHLC bar downsampling (the candlestick / metrics-rollup
    primitive): per ``event_type`` per ``bucket_s``-second bucket,
    the opening value (earliest event), high, low, and closing value
    (latest event), plus the event count.

    Open/close are struct-extremum selections —
    ``min(struct(ts, event_id, value)).value`` — so ties and arrival
    order are irrelevant: ``event_id`` breaks exact-timestamp ties
    deterministically in both engines, and no cross-row float
    arithmetic happens anywhere (every output is a selection of an
    input value), which is why the row hash matches the oracle
    exactly.

    One keyed hash aggregate with map-side partial combine: at 100 TB
    the shuffle carries only (type × bucket) partial states, never
    raw events.  Zero Python, one shuffle.
    """
    key = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        events.groupBy(
            "event_type",
            F.expr(
                f"(unix_timestamp(ts) div {int(bucket_s)}) * {int(bucket_s)}"
            ).alias("bar_ts"),
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(key)["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(key)["value"].alias("close"),
        )
    )

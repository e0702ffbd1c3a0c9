"""Event-time windowing over the ``events`` table (SURVEY.md §2.9/§2.10).

The reference has no true streaming surface (its "stream" is id-range
micro-batches over a bounded DataSet, ``CSVGraph.scala:47-103``).  The
engine exposes real event-time semantics: the same functions work on a
batch DataFrame and on a ``readStream`` DataFrame (add
``withWatermark`` upstream for late data; see ``streaming_session``).

Window starts are emitted as epoch seconds (long) so results
hash-compare across engines regardless of timestamp precision
(the parquet carries ns timestamps; Spark truncates to µs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling event-time window: count + sum(value) per (window, type)."""
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n"),
            # decimal-backed sum: exact & order-independent (money-like values)
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_agg(events: DataFrame, length_minutes: int = 60, slide_minutes: int = 30) -> DataFrame:
    """Sliding event-time window (length, slide) per event_type."""
    w = F.window("ts", f"{length_minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_agg(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session windows with an inactivity gap.

    Uses ``session_window`` (the native Spark stateful window, works in
    Structured Streaming with a watermark).  Output keyed by
    (user_id, session start epoch).
    """
    w = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), F.col("user_id"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).cast("long").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def json_props(events: DataFrame) -> DataFrame:
    """Typed extraction from the JSON ``props`` column (``from_json``)."""
    parsed = F.from_json(F.col("props"), "k INT")
    return events.select(
        "event_id",
        parsed["k"].cast("long").alias("prop_k"),
    )


def streaming_session(spark, source_dir: str, gap_minutes: int = 30, watermark: str = "2 hours"):
    """Structured Streaming variant: file source → watermarked session agg.

    Returns an unstarted streaming DataFrame; callers attach
    ``writeStream``.  Demonstrates the real streaming path the batch
    functions share.
    """
    stream = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
        )
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    return session_agg(stream, gap_minutes)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    lower_minutes: int = 0,
    upper_minutes: int = 30,
) -> DataFrame:
    """Keyed interval join: each left event pairs with the right events
    of the same key whose timestamp falls in
    ``[l.ts + lower, l.ts + upper]`` — attribution-style correlation
    (purchase → follow-up clicks, impression → conversion).

    Works identically on batch frames and on two watermarked streams:
    the join condition is an equi-key PLUS explicit event-time bounds,
    which is exactly the shape Structured Streaming requires to compute
    state watermarks and evict old rows (stream-stream joins without
    time bounds keep unbounded state).  In batch, the equi-key keeps it
    on the hash-join path with the band as a cheap post-filter — never
    a cartesian.  Parity between the two modes is pinned in
    ``tests/test_streaming.py``.
    """
    l = left.select(
        F.col(key).alias("k"),
        F.col("event_id").alias("l_id"),
        F.col("ts").alias("l_ts"),
    ).alias("l")
    r = right.select(
        F.col(key).alias("rk"),
        F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_ts"),
    ).alias("r")
    joined = l.join(
        r,
        (F.col("l.k") == F.col("r.rk"))
        & (
            F.col("r.r_ts")
            >= F.col("l.l_ts") + F.expr(f"INTERVAL {lower_minutes} MINUTES")
        )
        & (
            F.col("r.r_ts")
            <= F.col("l.l_ts") + F.expr(f"INTERVAL {upper_minutes} MINUTES")
        ),
    )
    return joined.select(
        F.col("l.k").cast("long").alias("user_id"),
        F.col("l.l_id").cast("long").alias("left_id"),
        F.col("r.r_id").cast("long").alias("right_id"),
        (F.unix_micros(F.col("r.r_ts")) - F.unix_micros(F.col("l.l_ts")))
        .cast("long")
        .alias("lag_us"),
    )


def late_data_audit(
    events: DataFrame,
    delay_minutes: int = 10,
    batch_col: str | None = None,
    lag: int = 1,
) -> DataFrame:
    """Watermark late-data audit (round 7): how much data WOULD a
    given watermark delay drop?  The sizing question every
    ``withWatermark`` deployment must answer before picking the delay.

    Semantics mirror Structured Streaming's watermark exactly: events
    arrive in ``event_id`` order, the watermark is the running max
    event time over already-arrived events minus ``delay_minutes``,
    and an event is LATE iff its own event time is below the watermark
    at arrival.  Batch-computable as one analytic window (running max
    over arrival order) + one aggregate — all integral-µs arithmetic,
    so the audit is oracle-exact.

    Output per event_type: ``(event_type, n_events, n_late,
    max_late_s)`` with max_late_s the worst lateness in whole seconds
    (0 when none are late).

    Scale note: the unpartitioned running max is a deliberate match
    for streaming's GLOBAL watermark and costs one total-order sort.
    At 100 TB the audit runs per arrival unit (file / hour partition)
    — same code over a partition-pruned scan, embarrassingly parallel
    — because a watermark decision is only ever needed per ingest
    batch, never over all history at once.

    When ``batch_col`` is given, the watermark advances at BATCH
    granularity instead of per row — the running max is over events in
    batches ≤ N-``lag`` only.  ``lag=1`` models the watermark value
    micro-batch N's progress reports (computed from batches ≤ N-1,
    the EVICTION watermark).  ``lag=2`` models what Spark ≥3.4
    actually uses to DROP late input: stateful operators filter with
    ``watermarkForLateEvents`` — the previous micro-batch's watermark,
    i.e. batches ≤ N-2 (verified empirically on this build:
    a 49-minute-late row arriving one batch after the watermark passed
    it is still accepted; two batches after, it is dropped and counted
    in ``numRowsDroppedByWatermark``).  With ``lag=2`` the batched
    audit equals a real ``withWatermark`` run's drop count exactly —
    ``tests/test_watermark_parity.py`` pins that equality end-to-end
    against a live streaming query.
    """
    from pyspark.sql import Window

    if batch_col is None:
        w = (
            Window.orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        w = (
            Window.orderBy(batch_col)
            .rangeBetween(Window.unboundedPreceding, -lag)
        )
    lateness = (
        F.max(F.unix_micros("ts")).over(w)
        - F.lit(delay_minutes * 60 * 1_000_000)
        - F.unix_micros("ts")
    )
    return (
        events.select(
            "event_type",
            F.coalesce(lateness, F.lit(-1)).alias("_late_us"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum((F.col("_late_us") > 0).cast("long"))
            .cast("long")
            .alias("n_late"),
            F.greatest(F.max("_late_us"), F.lit(0))
            .cast("long")
            .alias("max_late_us"),
        )
        .select(
            "event_type",
            "n_events",
            "n_late",
            # integral division on both engines (double-cast-to-long
            # truncates in Spark but ROUNDS in DuckDB)
            F.expr("max_late_us div 1000000").alias("max_late_s"),
        )
    )


def watermark_sizing(
    events: DataFrame,
    delays_minutes: tuple[int, ...] = (1, 5, 10, 30),
) -> DataFrame:
    """Watermark sizing curve (round 8): the capacity-planning
    companion to ``late_data_audit`` — for a GRID of candidate
    watermark delays, how many events would each drop?

    One analytic pass computes each event's disorder
    (``running max of prior event times − own event time``); every
    candidate delay is then just one more conditional sum over the
    SAME pass, so the whole curve costs exactly what a single-delay
    audit costs: one total-order sort + one aggregate.  This is the
    query a team runs ONCE per pipeline to pick the delay; the scale
    story is ``late_data_audit``'s (per ingest unit, partition-pruned,
    embarrassingly parallel).

    Output: ``(delay_minutes, n_events, n_late, pct_late)`` — one row
    per candidate delay, ``pct_late`` in basis points (integral, so
    both engines agree bit-for-bit).
    """
    from pyspark.sql import Window

    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    disorder = F.max(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    base = events.select(F.coalesce(disorder, F.lit(-1)).alias("_dis_us"))
    aggs = []
    for d in delays_minutes:
        # coalesce: SUM over an empty events table is NULL, not 0
        aggs.append(
            F.coalesce(
                F.sum((F.col("_dis_us") > d * 60 * 1_000_000).cast("long")), F.lit(0)
            )
            .cast("long")
            .alias(f"_late_{d}")
        )
    row = base.agg(F.count("*").cast("long").alias("_n"), *aggs)
    curve = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("delay_minutes"),
                        F.col("_n").alias("n_events"),
                        F.col(f"_late_{d}").alias("n_late"),
                    )
                    for d in delays_minutes
                ]
            )
        ).alias("r")
    )
    return curve.select(
        "r.delay_minutes",
        "r.n_events",
        "r.n_late",
        # greatest(n,1): integral-div guard so an empty events table
        # yields 0 bp instead of NULL (Spark) / a div-by-zero error
        # (DuckDB oracle) — same pattern as bloom_semi_prune's fpr_bp
        F.expr("(r.n_late * 10000) div greatest(r.n_events, 1L)").alias("pct_late_bp"),
    )

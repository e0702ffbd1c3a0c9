"""Unit tests for the temporal joins (operators/temporal.py).

The driver oracle (DuckDB ASOF JOIN / correlated band count) covers the
inner backward as-of and the band count on real data; these pin the
edge semantics the oracle query doesn't exercise: exact-time ties,
tolerance, how="left", empty right side, and count-0 left rows.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from community_detection_flink_spark.operators.temporal import (
    asof_join,
    range_count_join,
)


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, 10, ts("2024-01-01 10:00:00"), 5.0),
            (2, 10, ts("2024-01-01 10:00:05"), 6.0),   # exact tie with a quote
            (3, 10, ts("2024-01-01 09:00:00"), 7.0),   # before any quote
            (4, 20, ts("2024-01-01 10:00:00"), 8.0),   # key with no quotes
        ],
        "trade_id LONG, sym LONG, ts TIMESTAMP, price DOUBLE",
    )
    quotes = spark.createDataFrame(
        [
            (10, ts("2024-01-01 09:59:00"), 1.0),
            (10, ts("2024-01-01 10:00:05"), 2.0),      # == trade 2's time
            (10, ts("2024-01-01 11:00:00"), 3.0),      # after everything
        ],
        "sym LONG, ts TIMESTAMP, bid DOUBLE",
    )
    return trades, quotes


def test_asof_backward_inner(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", how="inner")
    rows = {r["trade_id"]: r for r in out.collect()}
    # trade 1: latest quote <= 10:00:00 is 09:59:00
    assert rows[1]["right_bid"] == 1.0
    # trade 2: exact-time quote matches (>= semantics)
    assert rows[2]["right_bid"] == 2.0
    # trade 3 (no prior quote) and trade 4 (no quotes at all) dropped
    assert set(rows) == {1, 2}


def test_asof_backward_left(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", how="left")
    rows = {r["trade_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[3]["right_bid"] is None
    assert rows[4]["right_bid"] is None
    # left payload intact on unmatched rows
    assert rows[4]["price"] == 8.0


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    # trade 1 is 60s after its match; tolerance 30s must null it out
    out = asof_join(
        trades, quotes, on="sym", how="inner", tolerance_seconds=30.0
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    assert set(rows) == {2}  # only the exact-time match survives


def test_asof_empty_right(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes.limit(0), on="sym", how="left")
    assert out.count() == 4
    assert all(r["right_bid"] is None for r in out.collect())


def test_asof_column_collision_raises(spark, trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes, on="sym", right_prefix="")


def test_range_count_join(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00:00")),
            (2, ts("2024-01-01 12:00:00")),  # nothing in its band
        ],
        "id LONG, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (ts("2024-01-01 09:00:01"),),   # inside (10:00 - 1h, 10:00]
            (ts("2024-01-01 10:00:00"),),   # boundary: rt <= lt counts
            (ts("2024-01-01 09:00:00"),),   # boundary: rt == lt - band excluded
            (ts("2024-01-01 10:30:00"),),   # after left row 1
        ],
        "ts TIMESTAMP",
    )
    out = range_count_join(left, right, band_seconds=3600)
    rows = {r["id"]: r["n_in_band"] for r in out.collect()}
    # left row 2 must appear with count 0, not vanish
    assert rows == {1: 2, 2: 0}


def test_heartbeat_gaps_edge_cases(spark):
    """Single-event users report 0 gaps / 0 max (not NULL); gaps are
    counted strictly above the threshold."""
    import datetime

    from community_detection_flink_spark.operators.temporal import (
        heartbeat_gaps,
    )

    t0 = datetime.datetime(2024, 1, 1)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: gaps 10, 45, 31 min -> 2 over a 30-min threshold
        (1, at(0), 1), (2, at(10), 1), (3, at(55), 1), (4, at(86), 1),
        # user 2: single event
        (5, at(0), 2),
        # user 3: gap exactly 30 min -> NOT over (strict >)
        (6, at(0), 3), (7, at(30), 3),
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG"
    )
    got = {
        r["user_id"]: (r["n_events"], r["n_gaps_over"], r["max_gap_s"])
        for r in heartbeat_gaps(ev, 30).collect()
    }
    assert got[1] == (4, 2, 45 * 60)
    assert got[2] == (1, 0, 0)
    assert got[3] == (2, 0, 30 * 60)

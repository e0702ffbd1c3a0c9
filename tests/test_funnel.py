"""Greedy event-funnel semantics (operators/temporal.py::funnel)."""

from __future__ import annotations

from datetime import datetime

from community_detection_flink_spark.operators.temporal import funnel


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2026, 1, 1, 0, 0, s), u, t, 0.0, "{}")
         for i, (u, t, s) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_funnel_greedy_and_window(spark):
    rows = [
        # user 1: full conversion in order
        (1, "view", 0), (1, "click", 10), (1, "purchase", 20),
        # user 2: click precedes view -> not counted (strictly after)
        (2, "click", 0), (2, "view", 5), (2, "purchase", 30),
        # user 3: click outside the 30s window -> reached stays 1,
        #         and the user must NOT vanish
        (3, "view", 0), (3, "click", 50),
        # user 4: no view at all -> absent
        (4, "click", 1), (4, "purchase", 2),
        # user 5: greedy picks the EARLIEST valid click (s=2), so the
        # purchase at s=1 (before it) does not convert
        (5, "view", 0), (5, "purchase", 1), (5, "click", 2),
    ]
    out = {r.user: r for r in funnel(
        _events(spark, rows), ["view", "click", "purchase"], within_seconds=30
    ).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert out[1].reached == 3 and out[1].converted
    assert out[2].reached == 1 and not out[2].converted   # no click after the view
    assert out[3].reached == 1 and out[3].t_2 is None
    assert out[5].reached == 2 and not out[5].converted   # purchase predates the click
    # step timestamps are ordered where present
    assert out[1].t_1 < out[1].t_2 < out[1].t_3

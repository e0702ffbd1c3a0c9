"""sequence_pattern_matches: strict-contiguity CEP semantics."""

from __future__ import annotations

import datetime

from community_detection_flink_spark.operators.temporal import (
    sequence_pattern_matches,
)

CHARS = {"view": "v", "click": "c", "purchase": "p", "error": "e"}


def _events(spark, rows):
    t0 = datetime.datetime(2024, 1, 1)
    data = [
        (i, t0 + datetime.timedelta(seconds=i), uid, et)
        for i, (uid, et) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING"
    )


def test_strict_contiguity_rejects_intervening_event(spark):
    # user 1: v c p  → one match; user 2: v e c p → the error event
    # breaks strict contiguity (funnel semantics WOULD match it)
    ev = _events(
        spark,
        [
            (1, "view"), (1, "click"), (1, "purchase"),
            (2, "view"), (2, "error"), (2, "click"), (2, "purchase"),
        ],
    )
    got = {
        (r.user_id, r.seq_len, r.n_matches)
        for r in sequence_pattern_matches(ev, "v+c+p", CHARS).collect()
    }
    assert got == {(1, 3, 1)}


def test_greedy_runs_count_once(spark):
    # vvccp is ONE match (greedy v+ and c+), vcpvcp is two
    ev = _events(
        spark,
        [(1, t) for t in ["view", "view", "click", "click", "purchase"]]
        + [
            (2, t)
            for t in ["view", "click", "purchase", "view", "click", "purchase"]
        ],
    )
    got = {
        (r.user_id, r.n_matches)
        for r in sequence_pattern_matches(ev, "v+c+p", CHARS).collect()
    }
    assert got == {(1, 1), (2, 2)}


def test_order_is_by_timestamp_not_insertion(spark):
    # events arrive out of order; (ts, event_id) ordering must
    # reconstruct v c p
    t0 = datetime.datetime(2024, 1, 1)
    data = [
        (10, t0 + datetime.timedelta(seconds=3), 1, "purchase"),
        (11, t0 + datetime.timedelta(seconds=1), 1, "view"),
        (12, t0 + datetime.timedelta(seconds=2), 1, "click"),
    ]
    ev = spark.createDataFrame(
        data, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING"
    )
    got = [
        (r.user_id, r.n_matches)
        for r in sequence_pattern_matches(ev, "vcp", CHARS).collect()
    ]
    assert got == [(1, 1)]


def test_no_match_users_excluded(spark):
    ev = _events(spark, [(1, "click"), (1, "view"), (2, "error")])
    assert sequence_pattern_matches(ev, "v+c+p", CHARS).count() == 0

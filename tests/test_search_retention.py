"""BM25 ranking (operators/search.py) + retention cohorts
(operators/temporal.py::retention_cohorts) on hand-checkable fixtures."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from community_detection_flink_spark.operators.search import bm25_topk
from community_detection_flink_spark.operators.temporal import retention_cohorts


def _bm25_model(texts, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in enumerate(texts)}
    n = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            scores[i] = s
    return scores


def test_bm25_matches_model(spark):
    texts = [
        "spark shuffle join spark spark",
        "hash join table scan",
        "the quick brown fox",
        "spark hash hash partition",
        "window agg window",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    terms = ["spark", "hash"]
    got = {r.doc_id: r.score for r in bm25_topk(docs, terms, k=10).collect()}
    want = _bm25_model(texts, terms)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=1e-5)


def test_bm25_rare_term_outranks_common(spark):
    # 'rare' appears in one doc, 'common' in all: the rare-term doc
    # must outscore an equal-tf common-term doc (idf dominance)
    docs = spark.createDataFrame(
        [
            (0, "common rare filler filler"),
            (1, "common filler filler filler"),
            (2, "common filler filler filler"),
            (3, "common filler filler filler"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = bm25_topk(docs, ["rare", "common"], k=4).collect()
    assert rows[0].doc_id == 0


def test_bm25_topk_limit_and_order(spark):
    docs = spark.createDataFrame(
        [(i, "term") for i in range(10)], "doc_id LONG, text STRING"
    )
    rows = bm25_topk(docs, ["term"], k=3).collect()
    # identical scores → doc_id ascending tie-break, exactly k rows
    assert [r.doc_id for r in rows] == [0, 1, 2]


def test_retention_cohorts_small(spark):
    ts = dt.datetime
    rows = [
        # user 1: first week of 2024-01-01 (a Monday), active wk0 + wk2
        (1, ts(2024, 1, 2, 10)),
        (1, ts(2024, 1, 3, 11)),  # same week — must not double count
        (1, ts(2024, 1, 16, 9)),
        # user 2: same cohort, only wk0
        (2, ts(2024, 1, 5, 8)),
        # user 3: cohort of 2024-01-08, active wk0 + wk1
        (3, ts(2024, 1, 9, 7)),
        (3, ts(2024, 1, 18, 7)),
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_tfidf_top_terms_small(spark):
    from community_detection_flink_spark.operators.search import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (0, "apple apple banana"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry durian"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
    # doc 0: apple (tf=2, df=1) beats banana (tf=1, df=2)
    assert by_doc[0] == [(1, "apple"), (2, "banana")]
    # doc 2: cherry tf=3 df=2 → 3*(ln(4/3)+1); durian tf=1 df=1 → ln(2)+1
    assert by_doc[2][0] == (1, "cherry")
    assert by_doc[2][1] == (2, "durian")
    # ranks never exceed k and scores are monotone within a doc
    for r in rows:
        assert r.rank <= 2


def test_scd2_history_runs_and_intervals(spark):
    import datetime as dt

    from community_detection_flink_spark.operators.temporal import scd2_history

    ts = dt.datetime
    rows = [
        # key 1: A (t1,t2 unchanged, collapsed) → B → A
        (1, 10, ts(2024, 1, 1), "A"),
        (1, 11, ts(2024, 1, 2), "A"),
        (1, 12, ts(2024, 1, 3), "B"),
        (1, 13, ts(2024, 1, 4), "A"),
        # key 2: NULL → value transition opens a new interval
        (2, 20, ts(2024, 1, 1), None),
        (2, 21, ts(2024, 1, 2), "X"),
    ]
    df = spark.createDataFrame(rows, "k LONG, uid LONG, ts TIMESTAMP, attr STRING")
    got = sorted(
        (
            (r.k, r.attr, str(r.valid_from), str(r.valid_to), r.is_current)
            for r in scd2_history(
                df, "k", "ts", ["attr"], tiebreak_col="uid"
            ).collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    assert got == [
        (1, "A", "2024-01-01 00:00:00", "2024-01-03 00:00:00", False),
        (1, "B", "2024-01-03 00:00:00", "2024-01-04 00:00:00", False),
        (1, "A", "2024-01-04 00:00:00", "None", True),
        (2, None, "2024-01-01 00:00:00", "2024-01-02 00:00:00", False),
        (2, "X", "2024-01-02 00:00:00", "None", True),
    ]


def test_scd2_same_timestamp_tiebreak(spark):
    import datetime as dt

    from community_detection_flink_spark.operators.temporal import scd2_history

    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, t, "A"), (1, 2, t, "B")], "k LONG, uid LONG, ts TIMESTAMP, attr STRING"
    )
    got = {(r.attr, r.is_current) for r in
           scd2_history(df, "k", "ts", ["attr"], tiebreak_col="uid").collect()}
    assert got == {("A", False), ("B", True)}


def test_zscore_anomalies_small(spark):
    from community_detection_flink_spark.operators.temporal import zscore_anomalies

    # group 'a': tight cluster + one wild outlier; group 'b': constant
    # (zero variance → no flags, no div-by-zero error)
    rows = [(i, "a", 10.0 + (i % 3) * 0.1) for i in range(20)]
    rows.append((99, "a", 1000.0))
    rows += [(100 + i, "b", 5.0) for i in range(5)]
    ev = spark.createDataFrame(rows, "event_id LONG, event_type STRING, value DOUBLE")
    got = zscore_anomalies(ev).collect()
    assert [r.event_id for r in got] == [99]
    assert got[0].z > 3


def test_normalize_text(spark):
    from community_detection_flink_spark.operators.textual import normalize_text

    docs = spark.createDataFrame(
        [(0, "  Hello\x00\x01  WORLD\t\n again  "), (1, "clean")],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: (r.clean_text, r.n_removed) for r in normalize_text(docs).collect()}
    assert got[0][0] == "hello world again"
    assert got[0][1] == len("  Hello\x00\x01  WORLD\t\n again  ") - len("hello world again")
    assert got[1] == ("clean", 0)


def test_quality_weighted_sample_boost_extremes(spark):
    from community_detection_flink_spark.operators.textual import (
        quality_weighted_sample,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in range(50)], "doc_id LONG, text STRING"
    )
    q1 = docs.sparkSession.createDataFrame(
        [(i, 1.0) for i in range(50)], "doc_id LONG, quality DOUBLE"
    )
    q0 = docs.sparkSession.createDataFrame(
        [(i, 0.0) for i in range(50)], "doc_id LONG, quality DOUBLE"
    )
    # quality 1 → keep-probability 1 → everything kept; quality 0 → nothing
    assert quality_weighted_sample(docs, q1).count() == 50
    assert quality_weighted_sample(docs, q0).count() == 0
    # deterministic: same inputs, same kept set
    qh = docs.sparkSession.createDataFrame(
        [(i, 0.5) for i in range(50)], "doc_id LONG, quality DOUBLE"
    )
    a = {r.doc_id for r in quality_weighted_sample(docs, qh).collect()}
    b = {r.doc_id for r in quality_weighted_sample(docs, qh).collect()}
    assert a == b and 0 < len(a) < 50


def test_nearest_centroid_assignment_and_ties(spark):
    from community_detection_flink_spark.operators.similarity import nearest_centroid

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [10.0, 10.0]),
            (2, [0.4, 0.0]),   # nearer centroid 0
            (3, [5.0, 5.0]),   # equidistant → tie broken to centroid 0
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])],
        "centroid_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {r.vec_id: (r.cluster, r.dist2) for r in nearest_centroid(emb, cents).collect()}
    assert got[0] == (0, 0.0)
    assert got[1] == (1, 0.0)
    assert got[2][0] == 0
    assert got[3][0] == 0  # exact tie → smallest centroid id

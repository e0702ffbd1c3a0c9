"""Round-7 operators: content-defined chunking, JL projection,
late-data audit."""

from __future__ import annotations

import datetime

import numpy as np
from pyspark.sql import functions as F

from community_detection_flink_spark.operators.dedup import (
    cdc_chunk_dedup,
    content_defined_chunks,
)
from community_detection_flink_spark.operators.similarity import (
    jl_distortion,
    jl_project,
    jl_sign_matrix,
)
from community_detection_flink_spark.streaming.windows import late_data_audit

TEXT = (
    "key agg row scan slow fast table value part hash value table part "
    "a row fast merge batch part value fast spark a a the line sort "
    "table window table table key scan merge row value fast hash batch"
)


def _chunks(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    return (
        content_defined_chunks(docs)
        .orderBy("doc_id", "chunk_no")
        .collect()
    )


def test_cdc_chunks_partition_the_text(spark):
    rows = [(0, TEXT), (1, "short"), (2, TEXT[:100])]
    got = _chunks(spark, rows)
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        ch = by_doc[doc_id]
        # contiguous 1-based spans covering exactly the text
        assert ch[0]["start"] == 1
        for a, b in zip(ch, ch[1:]):
            assert b["start"] == a["start"] + a["chunk_len"]
        assert sum(c["chunk_len"] for c in ch) == len(text)
        assert [c["chunk_no"] for c in ch] == list(range(len(ch)))


def test_cdc_shift_robustness(spark):
    """THE content-defined property: prepending text re-chunks only
    the head — every chunk after the first original boundary keeps its
    hash (fixed-size blocks would shift and change every one)."""
    got = _chunks(spark, [(0, TEXT), (1, "PREFIX " + TEXT)])
    ha = [r["chunk_hash"] for r in got if r["doc_id"] == 0]
    hb = [r["chunk_hash"] for r in got if r["doc_id"] == 1]
    assert len(ha) >= 3, "fixture text must produce several chunks"
    # B = (re-chunked head) + A's tail: suffix alignment after chunk 0
    assert hb[-(len(ha) - 1):] == ha[1:]
    assert hb[0] != ha[0]


def test_cdc_chunk_dedup_counts(spark):
    docs = spark.createDataFrame(
        [(0, TEXT), (1, TEXT), (2, "totally different words here")],
        "doc_id LONG, text STRING",
    )
    dd = {r["chunk_hash"]: r for r in cdc_chunk_dedup(docs).collect()}
    n_chunks = len(
        [r for r in _chunks(spark, [(0, TEXT)]) if r["doc_id"] == 0]
    )
    # every chunk of the duplicated doc recurs exactly twice across 2 docs
    twice = [r for r in dd.values() if r["n_occurrences"] == 2 and r["n_docs"] == 2]
    assert len(twice) >= n_chunks  # identical docs share all chunks
    for r in twice:
        assert r["first_doc"] in (0, 1)


def test_jl_projection_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(5, 64).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(5)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    signs = np.array(jl_sign_matrix(16, 64))
    got = {r["vec_id"]: r for r in jl_project(emb).collect()}
    for i in range(5):
        want = signs @ vecs[i].astype("float64")
        for j in range(16):
            # same index-ordered fold in numpy dot? dot may reorder —
            # compare against an explicit left fold instead
            acc = 0.0
            for t in range(64):
                acc += float(vecs[i][t]) * signs[j][t]
            assert got[i][f"p{j:02d}"] == acc
        # sanity: the fold agrees with numpy to float tolerance
        assert np.allclose([got[i][f"p{j:02d}"] for j in range(16)], want)
    # sign matrix is balanced enough to be a real projection
    assert 0.4 < (signs > 0).mean() < 0.6


def test_jl_distortion_near_one(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(30, 64).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    ratios = [r["ratio"] for r in jl_distortion(emb).collect()]
    assert len(ratios) == 435
    arr = np.array([r for r in ratios if r is not None])
    # JL with k=16: loose concentration, tight mean
    assert 0.15 < arr.min() and arr.max() < 4.0
    assert 0.8 < arr.mean() < 1.25


def test_late_data_audit_hand_values(spark):
    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, minutes, typ):
        return (eid, t0 + datetime.timedelta(minutes=minutes), 1, typ, 1.0, None)

    events = spark.createDataFrame(
        [
            ev(1, 0, "a"),
            ev(2, 60, "a"),      # advances watermark to 60 - 10 = 50
            ev(3, 30, "b"),      # 30 < 50 → late by 20 min
            ev(4, 49, "b"),      # 49 < 50 → late by 1 min
            ev(5, 51, "a"),      # 51 ≥ 50 → on time
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    got = {r["event_type"]: r for r in late_data_audit(events, 10).collect()}
    assert got["a"]["n_events"] == 3 and got["a"]["n_late"] == 0
    assert got["a"]["max_late_s"] == 0
    assert got["b"]["n_events"] == 2 and got["b"]["n_late"] == 2
    assert got["b"]["max_late_s"] == 20 * 60


def test_winnowing_overlap_pairs_excerpt(spark):
    from community_detection_flink_spark.operators.textual import (
        winnowing_overlap_pairs,
    )

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, "intro words first then " + base + " closing words after"),
            (2, "completely unrelated content about other things entirely "
                "nothing shared with anything else in this corpus at all ok"),
        ],
        "doc_id LONG, text STRING",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnowing_overlap_pairs(docs).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert not any(2 in p for p in pairs)
    # boilerplate cap: with max_df=1 every shared fingerprint is "too
    # common" (df=2) and the pair disappears
    assert winnowing_overlap_pairs(docs, max_df=1).count() == 0


def test_truncation_recall_bounds(spark):
    from community_detection_flink_spark.operators.similarity import (
        truncated_cosine_recall,
    )

    rng = np.random.RandomState(3)
    # corpus A: all signal in the first 16 dims → truncation changes nothing
    head = rng.randn(40, 16)
    vecs = np.hstack([head, np.zeros((40, 48))]).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = truncated_cosine_recall(emb, dims=16, k=5, n_queries=5).collect()
    assert len(got) == 5
    assert all(r["recall"] == 1.0 and r["n_overlap"] == 5 for r in got)

    # corpus B: signal ONLY in the last 48 dims → truncated ranking is
    # cosine over near-identical tiny heads: recall must degrade
    tail = rng.randn(40, 48)
    vecs2 = np.hstack([np.ones((40, 16)) * 0.001, tail]).astype("float32")
    emb2 = spark.createDataFrame(
        [(i, [float(x) for x in vecs2[i]]) for i in range(40)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got2 = truncated_cosine_recall(emb2, dims=16, k=5, n_queries=5).collect()
    assert sum(r["n_overlap"] for r in got2) < 25  # strictly below perfect


def test_resample_ffill_hand_values(spark):
    from community_detection_flink_spark.operators.temporal import resample_ffill

    t0 = datetime.datetime(2024, 3, 1, 10, 0)

    def ev(eid, day_offset, value, user=1):
        return (eid, t0 + datetime.timedelta(days=day_offset), user,
                "view", value, None)

    events = spark.createDataFrame(
        [
            ev(1, 0, 10.0),
            ev(2, 0, 11.0),   # later same day wins (struct-max on ts,event_id)
            ev(3, 3, 30.0),   # days 1-2 are gaps → forward-fill 11.0
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    got = sorted(
        (r["day_s"], r["value_ffill"])
        for r in resample_ffill(events).collect()
    )
    day0 = int(datetime.datetime(2024, 3, 1).timestamp())
    assert got == [
        (day0, 11.0),
        (day0 + 86400, 11.0),
        (day0 + 2 * 86400, 11.0),
        (day0 + 3 * 86400, 30.0),
    ]


def test_last_touch_attribution_hand_values(spark):
    from community_detection_flink_spark.operators.temporal import (
        last_touch_attribution,
    )

    t0 = datetime.datetime(2024, 3, 1)

    def ev(eid, hours, typ, user=1):
        return (eid, t0 + datetime.timedelta(hours=hours), user, typ, 1.0, None)

    events = spark.createDataFrame(
        [
            ev(1, 0, "view"),
            ev(2, 1, "click"),
            ev(3, 2, "purchase"),       # last touch: click, 1h ago
            ev(4, 3, "purchase"),       # last touch: still click (2h)
            ev(5, 100, "purchase"),     # click was 99h < 7d (168h) ago → click
            ev(6, 9000, "purchase"),    # > 7 days since any touch → none
            ev(7, 0, "purchase", 2),    # user 2: no touches at all → none
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    got = {r["event_id"]: r for r in last_touch_attribution(events).collect()}
    assert got[3]["channel"] == "click" and got[3]["lag_s"] == 3600
    assert got[4]["channel"] == "click" and got[4]["lag_s"] == 7200
    assert got[5]["channel"] == "click" and got[5]["lag_s"] == 99 * 3600
    assert got[6]["channel"] == "none" and got[6]["lag_s"] is None
    assert got[7]["channel"] == "none" and got[7]["lag_s"] is None

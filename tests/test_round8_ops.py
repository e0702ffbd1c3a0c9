"""Round-8 late additions: Bloom semi-join pruning, positional
phrase search, OHLC bars — closed-form hand-value tests."""

from __future__ import annotations

import datetime

from community_detection_flink_spark.operators.search import phrase_search
from community_detection_flink_spark.operators.sketches import (
    _BLOOM_HASHES,
    _BLOOM_PRIME,
    bloom_semi_prune,
)
from community_detection_flink_spark.operators.temporal import ohlc_bars


def _pos(key: int, m_bits: int = 1024) -> set[int]:
    return {((key * a + b) % _BLOOM_PRIME) % m_bits for a, b in _BLOOM_HASHES}


def test_bloom_no_false_negatives_and_exact_accounting(spark):
    """Every member key MUST pass (Bloom's one-sided guarantee), and
    the accounting row must match a from-scratch Python replay."""
    dim = spark.createDataFrame([(k,) for k in (3, 7, 11)], "s_suppkey LONG")
    fact_keys = [3, 3, 7, 11, 4, 5, 6, 8, 9, 10, 12, 13]
    fact = spark.createDataFrame([(k,) for k in fact_keys], "l_suppkey LONG")
    row = bloom_semi_prune(fact, dim, "l_suppkey", "s_suppkey").first()

    bits = set().union(*[_pos(k) for k in (3, 7, 11)])
    members = {3, 7, 11}
    n_pass = sum(1 for k in fact_keys if _pos(k) <= bits)
    n_member = sum(1 for k in fact_keys if k in members)
    n_fp = sum(1 for k in fact_keys if _pos(k) <= bits and k not in members)
    assert row.n_rows == len(fact_keys)
    assert row.n_member_rows == n_member
    assert row.n_pass == n_pass
    assert row.n_false_pos == n_fp
    assert row.n_pass >= row.n_member_rows  # no false negatives, ever
    assert row.n_bits_set == len(bits)
    assert row.fpr_bp == (n_fp * 10000) // max(len(fact_keys) - n_member, 1)


def test_bloom_saturated_filter_passes_everything(spark):
    """m=32 bits with 30 keys saturates the bitmap: every probe must
    pass (FPR → 100%), demonstrating the sizing failure mode rather
    than ever dropping a member."""
    dim = spark.createDataFrame([(k,) for k in range(30)], "s_suppkey LONG")
    fact = spark.createDataFrame(
        [(k,) for k in range(100, 140)], "l_suppkey LONG"
    )
    row = bloom_semi_prune(fact, dim, "l_suppkey", "s_suppkey", m_bits=32).first()
    bits = set().union(*[_pos(k, 32) for k in range(30)])
    expect = sum(1 for k in range(100, 140) if _pos(k, 32) <= bits)
    assert row.n_pass == expect
    assert row.n_false_pos == expect  # no fact key is a member here


def test_phrase_search_counts_and_positions(spark):
    docs = spark.createDataFrame(
        [
            (0, "key agg row x key agg row"),  # matches at 0 and 4
            (1, "agg row key agg nothing"),  # 'key agg' but no full phrase
            (2, "prefix key agg row"),  # match at 1
            (3, "key row agg"),  # right words, wrong order
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(docs, "key agg row").collect()
    }
    assert got == {0: (2, 0), 2: (1, 1)}


def test_phrase_search_overlapping_matches(spark):
    docs = spark.createDataFrame([(0, "a a a a")], "doc_id LONG, text STRING")
    got = phrase_search(docs, "a a").collect()
    assert len(got) == 1 and got[0].n_matches == 3 and got[0].first_pos == 0


def test_ohlc_hand_values(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def ev(i, minute, v):
        return (i, t0.replace(minute=minute), 1, "m", float(v), "{}")

    rows = [ev(1, 5, 3.0), ev(2, 10, 9.0), ev(3, 20, 1.0), ev(4, 50, 4.0)]
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    row = ohlc_bars(events).first()
    assert row.n_events == 4
    assert (row.open, row.high, row.low, row.close) == (3.0, 9.0, 1.0, 4.0)
    assert row.bar_ts == int(t0.replace(tzinfo=datetime.timezone.utc).timestamp())


def test_ohlc_tie_breaks_on_event_id(spark):
    """Two events at the identical timestamp: event_id decides which
    is 'open' and which is 'close' deterministically."""
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    events = spark.createDataFrame(
        [
            (2, t0, 1, "m", 7.0, "{}"),
            (1, t0, 1, "m", 5.0, "{}"),
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING",
    )
    row = ohlc_bars(events).first()
    assert (row.open, row.close) == (5.0, 7.0)


def test_zorder_interleave_hand_values(spark):
    """z(x=0b101, y=0b011) interleaves to y2x2 y1x1 y0x0 = 0b011011+
    ... checked against a Python-side bit interleave for a sample."""
    from community_detection_flink_spark.operators.layout import (
        z_interleave_sql,
    )

    def z_py(x, y, bits=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(x, y) for x in (0, 1, 5, 127, 255) for y in (0, 3, 64, 255)]
    df = spark.createDataFrame(rows, "x LONG, y LONG").selectExpr(
        "x", "y", f"{z_interleave_sql('x', 'y', 8, 'div')} AS z"
    )
    for r in df.collect():
        assert r.z == z_py(r.x, r.y), (r.x, r.y)


def test_zorder_pruning_beats_linear_on_box(spark):
    """A dense 256x256 grid: the default box (x half-space, one
    y-octave) must touch exactly 2 z-files vs 8 linear files."""
    import datetime

    from community_detection_flink_spark.operators.layout import (
        zorder_pruning_stats,
    )

    epoch = datetime.datetime(1970, 1, 1)
    rows = [
        (i, x, "O", 1.0, epoch + datetime.timedelta(days=y), "P")
        for i, (x, y) in enumerate(
            (x, y) for x in range(0, 256, 16) for y in range(0, 256, 16)
        )
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING",
    )
    r = zorder_pruning_stats(orders).first()
    assert r.n_rows == 256
    assert r.n_match == 8 * 2  # 8 x-samples in [0,127], 2 y in [16,47]
    assert r.zorder_files_touched == 2
    assert r.linear_files_touched == 8


def test_threshold_curve_monotone_and_consistent(spark):
    """Hand-built 4-vector block: counts must be monotone in the
    threshold and match a NumPy replay exactly at each cutoff."""
    import numpy as np

    from community_detection_flink_spark.operators.dedup import (
        cosine_dup_threshold_curve,
    )

    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.9, 0.1, 0.0],
        2: [0.0, 1.0, 0.0],
        3: [0.0, 0.95, 0.05],
    }
    emb = spark.createDataFrame(
        [(k, "b", v) for k, v in vecs.items()],
        "vec_id LONG, label STRING, embedding ARRAY<DOUBLE>",
    )
    got = {
        r.threshold: (r.n_pairs, r.n_vec_with_dup)
        for r in cosine_dup_threshold_curve(emb).collect()
    }

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    pairs = [
        (i, j, cos(vecs[i], vecs[j]))
        for i in vecs
        for j in vecs
        if i < j
    ]
    for t in (0.2, 0.3, 0.35, 0.4, 0.5):
        over = [(i, j) for i, j, c in pairs if c >= t]
        nv = len({x for p in over for x in p})
        assert got[t] == (len(over), nv), t
    ns = [got[t][0] for t in (0.2, 0.3, 0.35, 0.4, 0.5)]
    assert ns == sorted(ns, reverse=True)


def test_ohlc_stream_matches_batch(spark):
    """ohlc_bars on a readStream (complete mode, availableNow) must
    emit exactly the batch answer — the operator is
    streaming-transparent like the window aggregates."""
    import tempfile

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (
            i,
            t0 + datetime.timedelta(minutes=11 * i),
            i % 3,
            "a" if i % 2 else "b",
            float((i * 37) % 100) / 4.0,
            "{}",
        )
        for i in range(60)
    ]
    schema = (
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
        " value DOUBLE, props STRING"
    )
    events = spark.createDataFrame(rows, schema)
    src = tempfile.mkdtemp(prefix="cdfs-ohlc-src-")
    ckpt = tempfile.mkdtemp(prefix="cdfs-ohlc-ckpt-")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src).withWatermark(
        "ts", "2 hours"
    )
    q = (
        ohlc_bars(stream)
        .writeStream.format("memory")
        .queryName("ohlc_out")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM ohlc_out").collect()))
    want = sorted(map(tuple, ohlc_bars(events).collect()))
    assert got == want and len(want) > 1


def test_merge_upsert_semantics(spark):
    """MERGE contract on a 4-row target: K / U / D / I each behave,
    and the deleted key is absent from the output."""
    from community_detection_flink_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k LONG, s STRING, v DOUBLE",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "U"),
            (3, None, 0.0, "D"),
            (9, "i", 90.0, "I"),
        ],
        "k LONG, s STRING, v DOUBLE, op STRING",
    )
    got = {
        r.k: (r.s, r.v, r.action)
        for r in merge_upsert(target, changes, "k", ["s", "v"]).collect()
    }
    assert got == {
        1: ("a", 10.0, "K"),
        2: ("b2", 21.0, "U"),
        4: ("d", 40.0, "K"),
        9: ("i", 90.0, "I"),
    }


def test_merge_upsert_duplicate_change_key_guard(spark):
    """VERDICT r8 #4: two change rows for one key violate the MERGE
    contract (the left join would fan the matched target row out).
    With check_unique_keys=True the operator raises eagerly; without
    it the documented contract applies (caller's responsibility)."""
    import pytest

    from community_detection_flink_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, "a", 10.0)], "k LONG, s STRING, v DOUBLE")
    dup_changes = spark.createDataFrame(
        [(1, "x", 1.0, "U"), (1, "y", 2.0, "U")],
        "k LONG, s STRING, v DOUBLE, op STRING",
    )
    with pytest.raises(ValueError, match="duplicate change key"):
        merge_upsert(target, dup_changes, "k", ["s", "v"], check_unique_keys=True)

    # a unique batch passes the guard and merges normally
    ok_changes = spark.createDataFrame(
        [(1, "x", 1.0, "U")], "k LONG, s STRING, v DOUBLE, op STRING"
    )
    got = merge_upsert(target, ok_changes, "k", ["s", "v"], check_unique_keys=True)
    assert [(r.k, r.s, r.v, r.action) for r in got.collect()] == [(1, "x", 1.0, "U")]

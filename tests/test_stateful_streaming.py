"""applyInPandasWithState operators: streaming sessions == batch
session_window; keyed streaming first-seen dedup.

Harness pattern: the parquet file source feeds one FILE per
micro-batch (``maxFilesPerTrigger=1`` + ``availableNow``), and two
far-future sentinel files advance the watermark after the real data so
every event-time timeout for the main users fires deterministically
before the query drains (batch N evaluates timeouts against the
watermark computed from batch N-1's data).
"""

from __future__ import annotations

import datetime
import os
import tempfile

from pyspark.sql import functions as F

from community_detection_flink_spark.streaming.stateful import (
    sessionize_stateful,
    streaming_first_seen,
)
from community_detection_flink_spark.streaming.windows import session_agg

_SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"
_T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _mins(m):
    return _T0 + datetime.timedelta(minutes=m)


def _write_file(spark, rows, directory, name):
    df = spark.createDataFrame(rows, _SCHEMA).coalesce(1)
    path = os.path.join(directory, name)
    df.write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, src_glob, build, ckpt, sink_name):
    stream = spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src_glob)
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {sink_name}")


def _sentinels(spark, directory, start_day=10):
    # two sentinel batches: the first advances the watermark past the
    # main data's timeouts, the second makes batch N-1's watermark
    # (the one timeouts are checked against) already be far-future
    for i in range(2):
        _write_file(
            spark,
            [(90_000 + i, _T0 + datetime.timedelta(days=start_day + i), 999, 0.0)],
            directory,
            f"f{8 + i}_sentinel",
        )


def test_stateful_sessions_match_batch(spark):
    # users 1/2: multi-session traces with gaps over and under 30 min,
    # an exact-30-min gap (SAME session — session_window merges
    # adjacent windows, the break condition is diff > gap), and a
    # same-timestamp pair
    rows = [
        (1, _mins(0), 1, 1.25),
        (2, _mins(10), 1, 2.50),
        (3, _mins(40), 1, 0.75),   # exactly 30 after -> merges
        (4, _mins(45), 1, 1.00),
        (5, _mins(120), 1, 3.00),  # second session
        (6, _mins(0), 2, 5.00),
        (7, _mins(0), 2, 0.50),    # duplicate timestamp, same session
        (8, _mins(29), 2, 1.00),   # 29 min gap -> same session
        (9, _mins(100), 2, 2.00),  # second session
    ]
    src = tempfile.mkdtemp(prefix="cdfs-state-src-")
    ckpt = tempfile.mkdtemp(prefix="cdfs-state-ckpt-")
    # split main rows across two files to exercise cross-batch state
    _write_file(spark, rows[:5], src, "f0_main")
    _write_file(spark, rows[5:], src, "f1_main")
    _sentinels(spark, src)

    got_df = _run_stream(
        spark,
        os.path.join(src, "*"),
        # delay > the main data's time span so user-2 rows (arriving in
        # batch 2 with event times before batch 1's max) are not late
        lambda s: sessionize_stateful(s, gap_minutes=30, watermark="3 hours"),
        ckpt,
        "stateful_sessions",
    )
    got = sorted(
        map(tuple, got_df.where("user_id != 999").collect())
    )
    batch = spark.createDataFrame(rows, _SCHEMA)
    want = sorted(map(tuple, session_agg(batch, 30).collect()))
    assert got == want
    assert len(want) == 4  # 2 sessions for user 1, 2 for user 2


def test_streaming_first_seen_dedup(spark):
    rows_a = [
        (1, _mins(0), 1, 7.0),
        (2, _mins(1), 1, 7.0),   # dup key within batch -> dropped
        (3, _mins(2), 2, 8.0),
    ]
    rows_b = [
        (4, _mins(3), 1, 7.0),   # dup key across batches -> dropped
        (5, _mins(4), 3, 9.0),
    ]
    src = tempfile.mkdtemp(prefix="cdfs-dedup-src-")
    ckpt = tempfile.mkdtemp(prefix="cdfs-dedup-ckpt-")
    _write_file(spark, rows_a, src, "f0_main")
    _write_file(spark, rows_b, src, "f1_main")
    _sentinels(spark, src)

    got_df = _run_stream(
        spark,
        os.path.join(src, "*"),
        lambda s: streaming_first_seen(
            s.withColumn("k", F.col("user_id")), "k", ttl_minutes=60, watermark="3 hours"
        ),
        ckpt,
        "first_seen",
    )
    got = {
        r["key"]: r["event_id"]
        for r in got_df.where("key != '999'").collect()
    }
    assert got == {"1": 1, "2": 3, "3": 5}


def test_streaming_first_seen_out_of_order_earlier_dup(spark):
    # an EARLIER-timestamped duplicate arriving in a LATER micro-batch
    # must be suppressed, not re-emitted (append-mode contract: one row
    # per key, the first ARRIVAL is canonical)
    rows_a = [
        (1, _mins(30), 1, 7.0),  # first arrival for key 1 (ts = +30)
        (2, _mins(2), 2, 8.0),
    ]
    rows_b = [
        (3, _mins(5), 1, 7.0),   # earlier event time, later batch -> dropped
        (4, _mins(40), 2, 8.0),  # later dup -> dropped
    ]
    src = tempfile.mkdtemp(prefix="cdfs-ooo-src-")
    ckpt = tempfile.mkdtemp(prefix="cdfs-ooo-ckpt-")
    _write_file(spark, rows_a, src, "f0_main")
    _write_file(spark, rows_b, src, "f1_main")
    _sentinels(spark, src)

    got_df = _run_stream(
        spark,
        os.path.join(src, "*"),
        lambda s: streaming_first_seen(
            s.withColumn("k", F.col("user_id")), "k", ttl_minutes=60, watermark="3 hours"
        ),
        ckpt,
        "first_seen_ooo",
    )
    rows = got_df.where("key != '999'").collect()
    # exactly one row per key, and key 1 kept its first ARRIVAL (id 1)
    assert sorted((r["key"], r["event_id"]) for r in rows) == [("1", 1), ("2", 2)]


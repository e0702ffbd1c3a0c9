"""End-to-end watermark parity (round 8 — VERDICT r7 task #3).

``late_data_audit(batch_col=..., lag=2)`` claims to predict EXACTLY
how many rows a real ``withWatermark`` deployment drops.  This test
runs an actual Structured Streaming query (parquet file source, one
file per micro-batch, 10-minute watermark, append-mode
``dropDuplicates``) over a deliberately disordered event set and
asserts the streamed survivor counts equal ``n_events - n_late`` from
the batched audit, per event type.

Why these exact choices:
- ``dropDuplicates`` (all keys unique) emits every surviving row
  immediately in append mode — survivors are fully observable, unlike
  windowed aggregation where open windows are held back at stream end;
- Spark ≥3.4 filters late input with ``watermarkForLateEvents`` — the
  PREVIOUS micro-batch's watermark, i.e. the running max over batches
  ≤ N-2 (``lag=2``), while progress/eviction use batches ≤ N-1;
  verified empirically: a 49-minute-late row one batch behind the
  watermark is accepted, two batches behind is dropped;
- straggler pull-backs include a +7 s term that breaks the 20 s event
  grid, so an event time can never tie the watermark exactly and the
  ``<`` vs ``<=`` boundary convention cannot matter.
"""

from __future__ import annotations

import datetime
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from community_detection_flink_spark.streaming.windows import late_data_audit

BASE = datetime.datetime(2024, 3, 1, tzinfo=datetime.timezone.utc)
N_BATCHES = 6
PER_BATCH = 60


def _event(i: int):
    """Mostly-ordered stream with injected stragglers: every 7th event
    arrives with its timestamp pulled back by an amount that grows
    with i — some within the 10-minute allowance, some far beyond."""
    fwd = datetime.timedelta(seconds=20 * i, milliseconds=500)
    if i % 7 == 3:
        fwd -= datetime.timedelta(seconds=60 * (28 + (i % 13)) + 7)
    types = ["click", "view", "purchase", "error"]
    return (i, BASE + fwd, i % 10, types[i % 4], float(i))


def _write_batches(src_dir: str):
    rows = [_event(i) for i in range(N_BATCHES * PER_BATCH)]
    for b in range(N_BATCHES):
        chunk = rows[b * PER_BATCH : (b + 1) * PER_BATCH]
        table = pa.table(
            {
                "event_id": pa.array([r[0] for r in chunk], pa.int64()),
                "ts": pa.array(
                    [r[1] for r in chunk], pa.timestamp("us", tz="UTC")
                ),
                "user_id": pa.array([r[2] for r in chunk], pa.int64()),
                "event_type": pa.array([r[3] for r in chunk], pa.string()),
                "value": pa.array([r[4] for r in chunk], pa.float64()),
            }
        )
        path = os.path.join(src_dir, f"batch{b}.parquet")
        pq.write_table(table, path)
        # the file source triggers in modification-time order
        os.utime(path, (1700000000 + b, 1700000000 + b))
    return rows


def test_watermark_drops_match_batched_audit(spark):
    src_dir = tempfile.mkdtemp(prefix="cdfs-wm-src-")
    ckpt = tempfile.mkdtemp(prefix="cdfs-wm-ckpt-")
    rows = _write_batches(src_dir)

    # ---- prediction: batched audit, Spark's late-events lag ----
    ev = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE",
    ).withColumn("b", (F.col("event_id") / PER_BATCH).cast("long"))
    audit = {
        r["event_type"]: (r["n_events"], r["n_late"])
        for r in late_data_audit(ev, 10, batch_col="b", lag=2).collect()
    }
    # the synthetic stream must actually exercise the drop path...
    assert sum(v[1] for v in audit.values()) > 0
    # ...while most stragglers stay inside the allowance
    assert sum(v[1] for v in audit.values()) < len(rows) // 7

    # ---- reality: actual withWatermark streaming run ----
    survived: dict = {}

    def on_batch(df, _bid):
        for r in df.collect():
            survived[r["event_id"]] = r["event_type"]

    stream = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, "
            "event_type STRING, value DOUBLE"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id", "ts"])
    )
    q = (
        stream.writeStream.foreachBatch(on_batch)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got: dict = {}
    for etype in survived.values():
        got[etype] = got.get(etype, 0) + 1
    want = {t: n - late for t, (n, late) in audit.items()}
    assert got == want, (got, want)
    # and the total drop count seen by Spark itself agrees
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == sum(late for _, late in audit.values())


def test_fixture_audit_batched_matches_rowlevel_when_ordered(spark):
    """The driver events fixture is time-ordered, so BOTH audit
    granularities must report zero late rows — and agree with each
    other (regression guard for the batched variant's window frame)."""
    from community_detection_flink_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "b", (F.col("event_id") / 100).cast("long")
    )
    row_level = {
        r["event_type"]: (r["n_events"], r["n_late"])
        for r in late_data_audit(ev, 10).collect()
    }
    for lag in (1, 2):
        batched = {
            r["event_type"]: (r["n_events"], r["n_late"])
            for r in late_data_audit(ev, 10, batch_col="b", lag=lag).collect()
        }
        assert row_level == batched
    assert all(late == 0 for _, late in row_level.values())


def test_watermark_sizing_curve(spark):
    """The sizing curve must be monotone in delay, agree with
    late_data_audit at the shared 10-minute point, and count the
    synthetic stragglers correctly."""
    from pyspark.sql import functions as F  # noqa: F811

    from community_detection_flink_spark.streaming.windows import (
        watermark_sizing,
    )

    rows = [_event(i) for i in range(N_BATCHES * PER_BATCH)]
    ev = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE",
    )
    curve = {
        r["delay_minutes"]: (r["n_events"], r["n_late"], r["pct_late_bp"])
        for r in watermark_sizing(ev, (1, 5, 10, 30)).collect()
    }
    assert set(curve) == {1, 5, 10, 30}
    lates = [curve[d][1] for d in (1, 5, 10, 30)]
    assert lates == sorted(lates, reverse=True)
    assert lates[0] > 0  # stragglers exceed a 1-minute allowance
    # agreement with the single-delay audit at 10 minutes
    audit_total = sum(
        r["n_late"] for r in late_data_audit(ev, 10).collect()
    )
    assert curve[10][1] == audit_total
    n = len(rows)
    assert curve[10][2] == (curve[10][1] * 10000) // n

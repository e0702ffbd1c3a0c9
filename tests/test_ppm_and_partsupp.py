"""Round-7 additions: real P6 frame-stream decode + partsupp synthesis.

The PPM stream parser replaced the last labeled stub
(``frame_sample_stub``); ``_partsupp`` unblocked TPC-H q2/q9/q11/q16/
q20 (the testdata ships no partsupp table).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from community_detection_flink_spark.operators.multimodal import (
    _parse_ppm_stream,
    ppm_frame_sample,
    synthesize_ppm_stream_blobs,
)

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402
import pytest


def _p6(w, h, rgb, comment=False):
    hdr = b"P6\n" + (b"# a comment\n" if comment else b"")
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + bytes(rgb) * (w * h)


def test_parse_ppm_stream_headers_comments_truncation():
    blob = _p6(3, 2, (10, 20, 30)) + _p6(2, 2, (0, 255, 128), comment=True)
    # truncated third frame: header promises more bytes than exist
    blob += b"P6\n4 4\n255\n" + b"\x00" * 5
    frames = _parse_ppm_stream(blob)
    assert len(frames) == 2
    off0, w0, h0, r0, g0, b0 = frames[0]
    assert (off0, w0, h0) == (0, 3, 2)
    assert (r0, g0, b0) == (10.0, 20.0, 30.0)
    off1, w1, h1, r1, g1, b1 = frames[1]
    assert off1 == len(_p6(3, 2, (10, 20, 30)))
    assert (w1, h1) == (2, 2)
    assert (r1, g1, b1) == (0.0, 255.0, 128.0)
    # garbage input: zero frames, no exception
    assert _parse_ppm_stream(b"\x89PNG\r\n") == []
    assert _parse_ppm_stream(b"") == []


def test_ppm_roundtrip_matches_closed_form(spark):
    docs = spark.createDataFrame([(i,) for i in range(25)], "doc_id LONG")
    blobs = synthesize_ppm_stream_blobs(docs)
    got = {
        (r["doc_id"], r["frame_no"]): r
        for r in ppm_frame_sample(blobs, every_k=1).collect()
    }
    for i in range(25):
        w, h, nf = 4 + i % 8, 2 + i % 6, 2 + i % 5
        frame_bytes = 9 + len(str(w)) + len(str(h)) + w * h * 3
        for f in range(nf):
            r = got[(i, f)]
            assert (r["width"], r["height"]) == (w, h)
            assert r["byte_offset"] == f * frame_bytes
            assert r["mean_r"] == (i + 11 * f) % 256
            assert r["mean_g"] == (i * 7 + 3 * f) % 256
            assert r["mean_b"] == (i * 13 + 5 * f) % 256
    assert len(got) == sum(2 + i % 5 for i in range(25))


def test_partsupp_is_a_valid_dimension(spark):
    """4 rows per part, (partkey, suppkey) unique, keys in range —
    the PK/FK contract the TPC-H queries assume of dbgen's table."""
    sf = "/root/testdata/sf0.001"
    ps = entry_mod._partsupp(spark, sf)
    n_parts = spark.read.parquet(f"{sf}/part.parquet").count()
    n_supp = spark.read.parquet(f"{sf}/supplier.parquet").count()
    assert ps.count() == 4 * n_parts
    dup = (
        ps.groupBy("ps_partkey", "ps_suppkey")
        .count()
        .where("count > 1")
        .count()
    )
    assert dup == 0
    bounds = ps.agg(
        F.min("ps_suppkey"), F.max("ps_suppkey"),
        F.min("ps_availqty"), F.max("ps_availqty"),
        F.min("ps_supplycost"), F.max("ps_supplycost"),
    ).first()
    assert 0 <= bounds[0] and bounds[1] < n_supp
    assert 1 <= bounds[2] and bounds[3] <= 9999
    assert float(bounds[4]) >= 1.0 and float(bounds[5]) <= 1000.0


@pytest.mark.slow
def test_cdc_stream_one_file_per_batch(spark, golden_edges):
    """maxFilesPerTrigger=1 must make each source file its own
    micro-batch, carrying WCC state batch-over-batch (the shape the
    bench's wcc_cdc_stream metric relies on)."""
    import glob
    import shutil
    import tempfile

    from community_detection_flink_spark.operators.incremental import prepare
    from community_detection_flink_spark.sources.edges import symmetrize_edges
    from community_detection_flink_spark.streaming.incremental_stream import (
        run_stream,
    )

    src_dir = tempfile.mkdtemp(prefix="cdfs-cdc-src-")
    ckpt = tempfile.mkdtemp(prefix="cdfs-cdc-ckpt-")
    batches = [
        # batch 0: attach a triangle at vertex 7, then delete one of
        # its edges again (I-then-D inside one batch)
        [(7, 10, "I"), (10, 7, "I"), (7, 11, "I"), (11, 7, "I"),
         (10, 11, "I"), (11, 10, "I"), (10, 11, "D")],
        # batch 1: re-insert the deleted edge and close a triangle
        # 10-11-12, so the three end up in one community again
        [(11, 12, "I"), (12, 11, "I"), (10, 12, "I"), (12, 10, "I"),
         (10, 11, "I"), (11, 10, "I")],
    ]
    for k, rows in enumerate(batches):
        tmp = tempfile.mkdtemp(prefix="cdfs-cdc-tmp-")
        (
            spark.createDataFrame(rows, "src LONG, dst LONG, op STRING")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        shutil.move(
            glob.glob(f"{tmp}/part-*.parquet")[0], f"{src_dir}/b{k}.parquet"
        )
        shutil.rmtree(tmp, ignore_errors=True)

    seen = []
    state0 = prepare(symmetrize_edges(golden_edges))
    handle = run_stream(
        spark, src_dir, state0, ckpt,
        on_batch=lambda _s, bid: seen.append(bid),
        cdc=True, max_files_per_trigger=1,
    )
    handle.await_termination(240)
    assert len(seen) == 2, f"expected 2 micro-batches, saw {seen}"
    got = {r["vId"]: r["cId"] for r in handle.state.vertices.collect()}
    # 10/11/12 joined via batch-1 edges despite the batch-0 delete
    assert got[10] == got[11] == got[12]

"""Sinks (S5), approximate aggregates (A9), and loader edge cases."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from community_detection_flink_spark.sources.sinks import PhaseTap, write_csv, write_parquet


def test_csv_sink_roundtrip(spark, golden_edges):
    d = tempfile.mkdtemp(prefix="cdfs-sink-")
    write_csv(golden_edges, f"{d}/edges")
    back = spark.read.schema("src LONG, dst LONG").csv(f"{d}/edges")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, golden_edges.collect()))


def test_parquet_sink_partitioned(spark, golden_edges):
    d = tempfile.mkdtemp(prefix="cdfs-sink-")
    df = golden_edges.withColumn("bucket", F.col("src") % 2)
    write_parquet(df, f"{d}/edges", partition_by=["bucket"])
    assert os.path.isdir(f"{d}/edges/bucket=0")
    assert spark.read.parquet(f"{d}/edges").count() == golden_edges.count()


def test_phase_tap_noop_and_active(spark, golden_edges):
    assert PhaseTap(None)(golden_edges, "x") is golden_edges
    d = tempfile.mkdtemp(prefix="cdfs-tap-")
    PhaseTap(d)(golden_edges, "edges")
    assert spark.read.schema("src LONG, dst LONG").csv(f"{d}/edges").count() == golden_edges.count()


def test_approx_count_distinct_tolerance(spark):
    """A9 — approx_count_distinct within 5% of exact on lineitem keys."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"]


def test_compact_parquet_preserves_rows_and_shrinks_files(spark, tmp_path):
    from community_detection_flink_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    # fragment: 16 small files
    df.repartition(16).write.mode("overwrite").parquet(path)
    before = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["files_before"] == 16 and stats["files_after"] == 1
    after = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert after == before
    # idempotent: a second pass is a no-op
    stats2 = compact_parquet(spark, path, target_file_mb=128)
    assert stats2["files_before"] == stats2["files_after"] == 1


def test_compact_parquet_crash_recovery(spark, tmp_path):
    """ADVICE r4: the two-rename swap has a crash window where the
    dataset exists only as ``.compact-old``.  The next call must
    restore it (and sweep stale ``.compact-tmp`` leftovers) before
    doing anything else."""
    import os
    import shutil

    from community_detection_flink_spark.sources.sinks import compact_parquet

    path = str(tmp_path / "frag2")
    df = spark.range(0, 1_000).withColumn("v", F.col("id") * 3)
    df.repartition(4).write.mode("overwrite").parquet(path)
    before = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())

    # simulate a crash between the two renames: dataset gone, only
    # .compact-old (the original) and a half-written .compact-tmp left
    os.rename(path, path + ".compact-old")
    os.makedirs(path + ".compact-tmp")
    with open(os.path.join(path + ".compact-tmp", "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")

    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["files_before"] == 4 and stats["files_after"] == 1
    assert sorted((r.id, r.v) for r in spark.read.parquet(path).collect()) == before
    assert not os.path.exists(path + ".compact-old")
    assert not os.path.exists(path + ".compact-tmp")
    shutil.rmtree(path)


def test_edge_csv_malformed_rows(spark, tmp_path):
    """Source robustness: the schema'd CSV scan NULLs unparseable
    columns (Spark PERMISSIVE default) instead of failing the job, and
    the pipeline's own symmetrize step drops them — a malformed line
    in a 100 TB edge dump must not kill the run."""
    from community_detection_flink_spark.sources.edges import (
        load_edges_csv,
        symmetrize_edges,
    )

    p = tmp_path / "edges.csv"
    p.write_text("1 2\n2 3\nnot a row\n3\n4 x\n3 1\n")
    raw = load_edges_csv(spark, str(p))
    assert raw.count() == 6  # every line yields a row in PERMISSIVE mode
    good = raw.na.drop()
    assert good.count() == 3
    sym = symmetrize_edges(good)
    assert sym.count() == 6  # 3 undirected edges doubled
    # DROPMALFORMED variant reads clean directly
    dropped = (
        spark.read.schema("src LONG, dst LONG")
        .option("delimiter", " ")
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    assert dropped.na.drop().count() == 3

"""The fused community-adjacency path must be a pure plan change.

``community_adjacency`` feeds stats / global WCC / movement in the
refinement loop; each consumer also has a standalone (triplet-scan)
path.  These tests pin that both paths produce identical values, so
plan work can never silently change the math.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from community_detection_flink_spark.sources.edges import symmetrize_edges
from community_detection_flink_spark.operators.preprocess import preprocess
from community_detection_flink_spark.operators.triangles import triangles
from community_detection_flink_spark.operators.community import (
    best_movement,
    community_adjacency,
    community_stats,
    global_wcc,
)


@pytest.fixture()
def labeled_graph(spark, golden_edges):
    sym = symmetrize_edges(golden_edges)
    vertices, clean = preprocess(sym)
    labeled = vertices.withColumn("cId", F.col("vId") % 3)
    # hard-cut lineage: every consumer below references these several
    # times, and an unmaterialized triangle-enumeration plan inlined
    # per reference blows past the test driver's heap
    labeled = spark.createDataFrame(labeled.collect(), labeled.schema)
    clean = spark.createDataFrame(clean.collect(), clean.schema)
    return labeled, clean


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_community_stats_paths_agree(labeled_graph):
    labeled, clean = labeled_graph
    vcd = community_adjacency(labeled, clean)
    via_vcd = community_stats(labeled, clean, vcd=vcd)
    via_scan = community_stats(labeled, clean)
    assert _rows(via_vcd) == _rows(via_scan)


def test_global_wcc_paths_agree(labeled_graph):
    labeled, clean = labeled_graph
    vc = labeled.count()
    stats = community_stats(labeled, clean)
    tri = triangles(clean)
    vcd = community_adjacency(labeled, clean)
    w_fused = global_wcc(labeled, clean, stats, vc, vcd=vcd, tri=tri)
    w_scan = global_wcc(labeled, clean, stats, vc)
    assert w_fused == pytest.approx(w_scan, abs=1e-12)


def test_best_movement_paths_agree(labeled_graph, spark):
    from community_detection_flink_spark.plans.iteration import Materializer

    labeled, clean = labeled_graph
    vc = labeled.count()
    stats = community_stats(labeled, clean)
    gcc = float(labeled.agg(F.sum("cc")).first()[0]) / vc
    vcd = community_adjacency(labeled, clean)
    # both paths get a Materializer, like every real caller: without the
    # within-round caches the movement plan duplicates the theta-kernel
    # expression trees several times over
    mat_a, mat_b = Materializer(spark), Materializer(spark)
    via_vcd = best_movement(labeled, clean, stats, gcc, vc, mat=mat_a, vcd=vcd)
    via_scan = best_movement(labeled, clean, stats, gcc, vc, mat=mat_b)
    got_a = _rows(via_vcd.select("vId", "cId"))
    got_b = _rows(via_scan.select("vId", "cId"))
    mat_a.release()
    mat_b.release()
    assert got_a == got_b

"""Pinned regression on the reference's own dataset.

The only data the reference ships is ``/root/reference/test_graph.csv``
(25,571 space-delimited edges, SNAP email-Eu-core graph per the comment
at ``MyMain.scala:31`` — loaded by ``CSVGraph.scala:24-28``).  This
test pins the engine's end-to-end result on it so any refinement
regression fails loudly instead of shipping silently.

Pinned 2026-08 (post wccT>=0 clamp, which mirrors the reference's
candidate fold starting at 0.0 — DistributedWCC.scala:380-413):
|V| = 986 (vertices on >=1 edge), 208 communities, global WCC
0.1670151 +/- 1e-6, global CC 0.4428756 +/- 1e-9, 8 refinement rounds.
"""

from __future__ import annotations

import os

import pytest

from community_detection_flink_spark.sources.edges import (
    load_edges_csv,
    symmetrize_edges,
)
from community_detection_flink_spark.operators.refinement import run_wcc

REF_GRAPH = "/root/reference/test_graph.csv"


@pytest.mark.skipif(not os.path.exists(REF_GRAPH), reason="reference graph absent")
def test_reference_graph_pinned(spark):
    edges = symmetrize_edges(load_edges_csv(spark, REF_GRAPH))
    res = run_wcc(edges)

    assert res.vertex_count == 986
    n_comms = res.communities.select("cId").distinct().count()
    assert n_comms == 208
    assert abs(res.global_wcc - 0.1670151152867892) < 1e-6
    assert abs(res.global_cc - 0.4428756460387996) < 1e-9
    assert res.iterations == 8


@pytest.mark.skipif(not os.path.exists(REF_GRAPH), reason="reference graph absent")
def test_reference_graph_metrics_pinned(spark):
    """Pin the round-3 graph-metric operators on the same SNAP graph
    (values computed 2026-08): vertex 160 is the PageRank hub, the
    20-core keeps 461 of 986 vertices, and the graph's BFS eccentricity
    from the min id is 4 with everything reachable."""
    from pyspark.sql import functions as F

    from community_detection_flink_spark.operators.graph_metrics import (
        bfs_distances,
        k_core,
        pagerank,
    )

    edges = symmetrize_edges(load_edges_csv(spark, REF_GRAPH))

    pr = pagerank(edges)
    top = pr.orderBy(F.col("pr").desc()).limit(1).collect()[0]
    assert top.vId == 160
    assert top.pr == pytest.approx(0.009438184, abs=1e-9)
    # rank mass conserved (no dangling vertices after symmetrize)
    assert pr.agg(F.sum("pr")).first()[0] == pytest.approx(1.0, abs=1e-6)

    assert k_core(edges, 20).count() == 461

    bfs = bfs_distances(edges)
    assert bfs.count() == 986  # fully reachable from the min id
    assert bfs.agg(F.max("dist")).first()[0] == 4

"""PageRank + k-core (operators/graph_metrics.py) against brute-force
driver-side models on small fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from community_detection_flink_spark.operators.graph_metrics import k_core, pagerank
from community_detection_flink_spark.sources.edges import symmetrize_edges


def _doubled(spark, pairs):
    return symmetrize_edges(
        spark.createDataFrame(pairs, "src LONG, dst LONG")
    )


def _pagerank_model(pairs, iterations=5, d=0.85):
    """Reference power iteration in plain Python dicts."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    pr = {v: 1.0 / n for v in adj}
    for _ in range(iterations):
        nxt = {}
        for v in adj:
            mass = sum(pr[u] / len(adj[u]) for u in adj[v])
            nxt[v] = (1.0 - d) / n + d * mass
        pr = nxt
    return pr


def test_pagerank_matches_model_and_sums_to_one(spark, golden_edges):
    pairs = [(r.src, r.dst) for r in golden_edges.collect()]
    got = {r.vId: r.pr for r in pagerank(symmetrize_edges(golden_edges)).collect()}
    want = _pagerank_model(pairs)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # total rank mass is conserved (no dangling vertices on a
    # symmetrized graph)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_path_graph_ordering(spark):
    # path 0-1-2-3-4: the degree-1 ends donate their WHOLE mass to
    # vertices 1/3, which therefore outrank the middle; ends rank last
    e = _doubled(spark, [(i, i + 1) for i in range(4)])
    pr = {r.vId: r.pr for r in pagerank(e).collect()}
    assert pr[1] == pytest.approx(pr[3], abs=1e-12)
    assert pr[0] == pytest.approx(pr[4], abs=1e-12)
    assert pr[1] > pr[2] > pr[0]
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)


def _kcore_model(pairs, k):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    changed = True
    while changed:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        changed = bool(drop)
        alive -= drop
    return {v: len(adj[v] & alive) for v in alive}


@pytest.mark.parametrize("k", [2, 3, 4])
def test_kcore_matches_model(spark, golden_edges, k):
    pairs = [(r.src, r.dst) for r in golden_edges.collect()]
    got = {r.vId: r.deg for r in k_core(symmetrize_edges(golden_edges), k).collect()}
    assert got == _kcore_model(pairs, k)


def test_kcore_peels_transitively(spark):
    # a 3-clique with a pendant chain: k=2 keeps only the clique, and
    # the chain must peel away over MULTIPLE rounds (5-4, then 4-3)
    e = _doubled(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)])
    got = {r.vId: r.deg for r in k_core(e, 2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_kcore_empty_when_k_exceeds_degrees(spark):
    e = _doubled(spark, [(0, 1), (1, 2)])
    assert k_core(e, 5).count() == 0


def test_bfs_distances_path_and_unreachable(spark):
    from community_detection_flink_spark.operators.graph_metrics import bfs_distances

    # path 0-1-2-3 plus a disconnected edge 10-11
    e = _doubled(spark, [(0, 1), (1, 2), (2, 3), (10, 11)])
    got = {r.vId: r.dist for r in bfs_distances(e).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 10/11 unreachable → absent


def test_bfs_distances_explicit_source_and_cap(spark):
    from community_detection_flink_spark.operators.graph_metrics import bfs_distances

    e = _doubled(spark, [(i, i + 1) for i in range(6)])
    got = {r.vId: r.dist for r in bfs_distances(e, source=3).collect()}
    assert got == {3: 0, 2: 1, 4: 1, 1: 2, 5: 2, 0: 3, 6: 3}
    capped = {r.vId: r.dist for r in bfs_distances(e, source=0, max_depth=2).collect()}
    assert capped == {0: 0, 1: 1, 2: 2}


def test_approx_centrality_path_graph_hand_values(spark):
    """Path 0-1-2-3-4, landmarks {0,1,2,3} (smallest ids).

    closeness(v) = k / Σ_ℓ d(v,ℓ):  0 → 4/6, 2 → 4/4, 4 → 4/10.
    betweenness(v) = #{(ℓ1<ℓ2): d(ℓ1,v)+d(v,ℓ2)=d(ℓ1,ℓ2), v∉{ℓ1,ℓ2}}:
    interior pivots 1 and 2 each sit on 2 landmark pairs; endpoints
    0, 3-as-endpoint-of-sample and off-path 4 sit on none."""
    from community_detection_flink_spark.operators.graph_metrics import (
        approx_centrality,
    )
    from community_detection_flink_spark.sources.edges import symmetrize_edges

    e = symmetrize_edges(
        spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
        )
    )
    got = {
        r.vId: (round(r.closeness, 9), r.betweenness)
        for r in approx_centrality(e, n_landmarks=4, max_depth=10).collect()
    }
    assert got == {
        0: (round(4 / 6, 9), 0),
        1: (round(4 / 4, 9), 2),
        2: (round(4 / 4, 9), 2),
        3: (round(4 / 6, 9), 0),
        4: (round(4 / 10, 9), 0),
    }


def test_pagerank_empty_edges_returns_empty(spark):
    """ADVICE r5 (low): hoisting 1/N to driver arithmetic made the
    empty edge list raise ZeroDivisionError; it must return an empty
    (vId, pr) frame like bfs_distances does."""
    from community_detection_flink_spark.operators.graph_metrics import (
        pagerank_weighted,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank(empty)
    assert out.columns == ["vId", "pr"] and out.count() == 0
    empty_w = spark.createDataFrame([], "src long, dst long, w double")
    out_w = pagerank_weighted(empty_w)
    assert out_w.columns == ["vId", "pr"] and out_w.count() == 0


def test_weighted_pagerank_reduces_to_unweighted(spark, golden_edges):
    from community_detection_flink_spark.operators.graph_metrics import (
        pagerank,
        pagerank_weighted,
    )

    e = symmetrize_edges(golden_edges)
    ew = e.withColumn("w", F.lit(1).cast("long"))
    uw = {r.vId: r.pr for r in pagerank(e).collect()}
    ww = {r.vId: r.pr for r in pagerank_weighted(ew).collect()}
    assert uw == ww  # w ≡ 1 must be EXACTLY the unweighted result


def test_weighted_pagerank_weight_pulls_rank(spark):
    from community_detection_flink_spark.operators.graph_metrics import (
        pagerank_weighted,
    )

    # triangle 0-1-2, but edge 0-1 is 10x heavier: 0 and 1 outrank 2
    rows = [(0, 1, 10), (1, 0, 10), (0, 2, 1), (2, 0, 1), (1, 2, 1), (2, 1, 1)]
    ew = spark.createDataFrame(rows, "src LONG, dst LONG, w LONG")
    pr = {r.vId: r.pr for r in pagerank_weighted(ew).collect()}
    assert pr[0] == pytest.approx(pr[1], abs=1e-9)
    assert pr[0] > pr[2]
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)


def test_modularity_known_values(spark):
    from community_detection_flink_spark.operators.graph_metrics import modularity

    # two disjoint triangles, perfectly split labeling: Q = 1/2
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    e = _doubled(spark, pairs)
    labs = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "vId LONG, cId LONG"
    )
    q = modularity(labs, e).collect()[0].modularity
    assert q == pytest.approx(0.5, abs=1e-9)
    # everything in ONE community: Q = 0
    labs1 = spark.createDataFrame([(i, 0) for i in range(6)], "vId LONG, cId LONG")
    assert modularity(labs1, e).collect()[0].modularity == pytest.approx(0.0, abs=1e-9)

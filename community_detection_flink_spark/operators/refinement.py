"""P3 refinement loop + full WCC pipeline entry (SURVEY.md I4, E1/E3).

Reference: ``DistributedWCC.run`` / ``refinePartition``
(``DistributedWCC.scala:34-82, 258-329``): accept a simultaneous
best-movement pass iff it improves global WCC; a relative improvement
> threshold (0.01) resets the retry budget (maxRetries = 5,
``DistributedWCC.scala:27-29``).

Iterative-Spark discipline the reference lacks (its Flink version
recomputes lineage and forces ``count()``s, ``DistributedWCC.scala:317``):
every accepted state is materialized through ``plans.Materializer``
(parquet round-trip — truncates lineage AND resets Catalyst's
compounding join-size statistics; see ``plans/iteration.py`` for why
``localCheckpoint`` is pathological here), and superseded state is
simply dropped.  Only O(1) scalars (the WCC value) ever reach the
driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from community_detection_flink_spark.operators.community import (
    best_movement,
    community_stats,
    global_wcc,
)
from community_detection_flink_spark.operators.partition import initial_partition
from community_detection_flink_spark.operators.preprocess import preprocess
from community_detection_flink_spark.plans.iteration import Materializer

THRESHOLD = 0.01  # DistributedWCC.scala:28
MAX_RETRIES = 5  # DistributedWCC.scala:30


@dataclass
class WCCResult:
    communities: DataFrame  # vId, cId over the FULL input vertex set
    stats: DataFrame  # cId, r, a, b, d over the refined partition
    global_wcc: float
    global_cc: float
    vertex_count: int
    iterations: int


def refine_partition(
    vertices: DataFrame,
    clean_edges: DataFrame,
    vertex_count: int,
    max_retries: int = MAX_RETRIES,
    threshold: float = THRESHOLD,
    mat: Materializer | None = None,
) -> tuple[DataFrame, DataFrame, float, float, int]:
    """Run the accept-if-improved movement loop.

    Returns (best_vertices, best_stats, best_wcc, global_cc, rounds).
    """
    mat = mat or Materializer(vertices.sparkSession)
    global_cc_total = vertices.agg(F.sum("cc").alias("s")).first()["s"] or 0.0
    global_cc = float(global_cc_total) / float(vertex_count)  # DistributedWCC.scala:261-262

    best = mat(vertices, "best")
    best_cs = mat(community_stats(best, clean_edges), "cs")
    best_wcc = global_wcc(best, clean_edges, best_cs, vertex_count, mat=mat)
    mat.release()

    retries = max_retries
    rounds = 0
    improved = True
    while improved and retries > 0:
        moved = mat(
            best_movement(best, clean_edges, best_cs, global_cc, vertex_count, mat=mat),
            "moved",
        )
        new_cs = mat(community_stats(moved, clean_edges), "cs")
        new_wcc = global_wcc(moved, clean_edges, new_cs, vertex_count, mat=mat)
        mat.release()  # drop this round's ephemeral caches (vcd/own/intra/oriented)
        retries -= 1
        rounds += 1
        if new_wcc > best_wcc:
            if best_wcc > 0 and (new_wcc / best_wcc - 1.0) > threshold:
                retries = max_retries  # DistributedWCC.scala:309-312
            best, best_cs, best_wcc = moved, new_cs, new_wcc
        else:
            improved = False
    return best, best_cs, best_wcc, global_cc, rounds


def run_wcc(
    edges: DataFrame,
    max_retries: int = MAX_RETRIES,
    threshold: float = THRESHOLD,
) -> WCCResult:
    """E1/E3 — full batch WCC community detection.

    ``edges`` must be the symmetrized doubled-edge set
    (``sources.edges.symmetrize_edges``).  Mirrors
    ``DistributedWCC.run`` (``DistributedWCC.scala:34-82``): vertices
    pruned in preprocessing keep their own singleton community in the
    final result (``DistributedWCC.scala:63-78``).
    """
    mat = Materializer(edges.sparkSession)
    edges = mat(edges, "edges")
    all_vertices = edges.select(F.col("src").alias("vId")).distinct()
    vertex_count = all_vertices.count()
    if vertex_count == 0:
        spark = edges.sparkSession
        return WCCResult(
            communities=spark.createDataFrame([], "vId LONG, cId LONG"),
            stats=spark.createDataFrame([], "cId LONG, r INT, a DOUBLE, b LONG, d DOUBLE"),
            global_wcc=0.0,
            global_cc=0.0,
            vertex_count=0,
            iterations=0,
        )

    vertices, clean_edges = preprocess(edges, mat=mat)
    clean_edges = mat(clean_edges, "clean-edges")
    vertices = mat(vertices, "clean-vertices")
    mat.release()  # triangle list + oriented edges no longer needed
    init = mat(initial_partition(vertices, clean_edges, mat=mat), "init")
    mat.release()  # MIS "higher" edge cache

    best, best_cs, best_wcc, global_cc, rounds = refine_partition(
        init, clean_edges, vertex_count, max_retries, threshold, mat=mat
    )

    communities = all_vertices.join(best.select("vId", "cId"), "vId", "left").select(
        "vId", F.coalesce("cId", F.col("vId")).alias("cId")
    )
    return WCCResult(
        communities=communities,
        stats=best_cs,
        global_wcc=best_wcc,
        global_cc=global_cc,
        vertex_count=vertex_count,
        iterations=rounds,
    )

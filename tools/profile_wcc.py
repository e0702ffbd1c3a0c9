"""Per-phase wall-clock profile of the WCC pipeline at a given sf_dir.

Usage: PYTHONPATH=/root/repo python tools/profile_wcc.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from community_detection_flink_spark import get_spark
from community_detection_flink_spark.operators.community import (
    best_movement,
    community_adjacency,
    community_stats,
    global_wcc,
)
from community_detection_flink_spark.operators.partition import initial_partition
from community_detection_flink_spark.operators.preprocess import preprocess
from community_detection_flink_spark.operators.triangles import triangles
from community_detection_flink_spark.plans.iteration import Materializer
from community_detection_flink_spark.sources.edges import co_purchase_edges

T0 = time.time()
_last = T0


def mark(label):
    global _last
    now = time.time()
    print(f"[{now - T0:7.1f}s] {label}: +{now - _last:.1f}s", flush=True)
    _last = now


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="wcc-profile", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    mark("session")

    mat = Materializer(spark)
    edges = mat(co_purchase_edges(spark, sf_dir), "edges")
    mark("edges load+materialize")
    all_vertices = edges.select(F.col("src").alias("vId")).distinct()
    vertex_count = all_vertices.count()
    mark(f"vertex count = {vertex_count}")

    tri = mat(triangles(edges, mat=mat), "tri")
    mat.release()
    mark("triangles")
    vertices, clean_edges = preprocess(edges, mat=mat, tri=tri)
    clean_edges = mat(clean_edges, "clean-edges")
    vertices = mat(vertices, "clean-vertices")
    mark("preprocess")
    init = mat(initial_partition(vertices, clean_edges, mat=mat), "init")
    mat.release()
    mark("initial_partition")

    global_cc_total = vertices.agg(F.sum("cc").alias("s")).first()["s"] or 0.0
    global_cc = float(global_cc_total) / float(vertex_count)
    loop_edges = clean_edges.repartition("src").persist()

    def _eval(labels, tag):
        vcd = community_adjacency(labels, loop_edges).persist()
        cs = mat(community_stats(labels, loop_edges, vcd=vcd), "cs")
        wcc = global_wcc(labels, loop_edges, cs, vertex_count, vcd=vcd, tri=tri)
        mark(f"eval[{tag}] wcc={wcc:.6f}")
        return vcd, cs, wcc

    best = mat(init, "best")
    best_vcd, best_cs, best_wcc = _eval(best, "init")

    retries, rounds, improved = 5, 0, True
    while improved and retries > 0:
        moved = mat(
            best_movement(best, loop_edges, best_cs, global_cc, vertex_count,
                          mat=mat, vcd=best_vcd),
            "moved",
        )
        mat.release()
        mark(f"movement round {rounds + 1}")
        new_vcd, new_cs, new_wcc = _eval(moved, f"round {rounds + 1}")
        retries -= 1
        rounds += 1
        if new_wcc > best_wcc:
            if best_wcc <= 0 or (new_wcc / best_wcc - 1.0) > 0.01:
                retries = 5
            best_vcd.unpersist(False)
            best, best_cs, best_wcc, best_vcd = moved, new_cs, new_wcc, new_vcd
        else:
            new_vcd.unpersist(False)
            improved = False
    mark(f"refinement done: rounds={rounds} wcc={best_wcc:.6f}")
    print(f"TOTAL {time.time() - T0:.1f}s")


if __name__ == "__main__":
    main()

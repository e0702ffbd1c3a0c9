"""r12 optimization profiler: phase walls + executor-metric split of the
full WCC pipeline (guide §1.1 both loops: wall from the driver, task
run/GC/shuffle split from the UI REST API via tools/stage_metrics).

Usage: PYTHONPATH=/root/repo python tools/profile_wcc_r12.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from community_detection_flink_spark import get_spark
from community_detection_flink_spark.operators.partition import initial_partition
from community_detection_flink_spark.operators.preprocess import preprocess
from community_detection_flink_spark.operators.refinement import refine_partition
from community_detection_flink_spark.operators.triangles import triangles
from community_detection_flink_spark.plans.iteration import Materializer
from community_detection_flink_spark.sources.edges import co_purchase_edges
from tools.stage_metrics import diff_report, snapshot

T0 = time.time()
_last = T0
_snap = None


def mark(spark, label):
    global _last, _snap
    now = time.time()
    s = snapshot(spark)
    line = f"[{now - T0:7.1f}s] {label}: +{now - _last:.1f}s"
    if _snap is not None:
        line += "\n    " + diff_report(_snap, s, label)
    print(line, flush=True)
    _last, _snap = now, s


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="wcc-profile-r12", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    mark(spark, "session")

    mat = Materializer(spark)
    edges = mat(co_purchase_edges(spark, sf_dir), "edges")
    mark(spark, "edges load+materialize")
    all_vertices = edges.select(F.col("src").alias("vId")).distinct()
    vertex_count = all_vertices.count()
    mark(spark, f"vertex count = {vertex_count}")

    tri = mat(triangles(edges, mat=mat), "tri")
    mat.release()
    n_tri = tri.count()
    mark(spark, f"triangles (n={n_tri})")
    vertices, clean_edges = preprocess(edges, mat=mat, tri=tri)
    clean_edges = mat(clean_edges, "clean-edges")
    vertices = mat(vertices, "clean-vertices")
    n_clean = clean_edges.count()
    mark(spark, f"preprocess (clean edges={n_clean})")
    init = mat(initial_partition(vertices, clean_edges, mat=mat), "init")
    mat.release()
    mark(spark, "initial_partition")

    history: list = []
    best, best_cs, best_wcc, global_cc, rounds = refine_partition(
        init, clean_edges, vertex_count, mat=mat, tri=tri, history=history,
    )
    mark(spark, f"refinement: rounds={rounds} wcc={best_wcc:.6f}")
    print(f"TOTAL {time.time() - T0:.1f}s  history={['%.5f' % h for h in history]}",
          flush=True)


if __name__ == "__main__":
    main()

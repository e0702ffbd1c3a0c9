"""Spark-job count per BATCH refinement round (VERDICT r9 #3).

The incremental path's r9 job-floor cut (221→133 jobs/batch) came from
scoped non-adaptive planning + fused landings; this tool measures the
same quantity for the batch `refine_partition` loop so the r10 port is
a number, not an assertion.  Phases run under their own job groups
(status-tracker job ids, so AQE query-stage jobs are counted).

Usage: PYTHONPATH=/root/repo python tools/count_jobs_batch.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from community_detection_flink_spark import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="batch-jobs", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from community_detection_flink_spark.operators.partition import (
        initial_partition,
    )
    from community_detection_flink_spark.operators.preprocess import preprocess
    from community_detection_flink_spark.operators.refinement import (
        refine_partition,
    )
    from community_detection_flink_spark.operators.triangles import triangles
    from community_detection_flink_spark.plans.iteration import Materializer
    from community_detection_flink_spark.sources.edges import co_purchase_edges

    def run_group(label, fn):
        sc.setJobGroup(label, label)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        sc.setJobGroup("idle", "idle")
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(label))
        print(f"{label}: {n_jobs} jobs, {dt:.1f}s", flush=True)
        return out, n_jobs, dt

    mat = Materializer(spark)
    edges = mat(co_purchase_edges(spark, sf_dir), "edges")
    vertex_count = edges.select("src").distinct().count()

    def _setup():
        tri = mat(triangles(edges, mat=mat), "tri")
        mat.release()
        vertices, clean_edges = preprocess(edges, mat=mat, tri=tri)
        clean_edges = mat(clean_edges, "clean-edges")
        vertices = mat(vertices, "clean-vertices")
        part = mat(initial_partition(vertices, clean_edges, mat=mat), "part")
        return tri, part, clean_edges

    (tri, part, clean_edges), _, _ = run_group("setup", _setup)

    hist: list = []

    def _refine():
        return refine_partition(
            part, clean_edges, vertex_count, mat=mat, tri=tri, history=hist
        )

    (best, cs, wcc, cc, rounds), nj, dt = run_group("refine", _refine)
    print(
        f"REFINE: {rounds} rounds, {nj} jobs "
        f"({nj / max(rounds, 1):.1f} jobs/round), {dt:.1f}s, "
        f"wcc={wcc:.5f}, accepted={len(hist) - 1}",
        flush=True,
    )


if __name__ == "__main__":
    main()

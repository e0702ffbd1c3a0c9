"""Spark-job count per incremental WCC batch (VERDICT r8 #5).

The wcc_incremental headline is dominated by per-batch orchestration
(SCALING.md's per-round anatomy) — this tool makes the job count a
measured number so fusions can be verified instead of asserted.  Each
phase of the split harness runs under its own job group; the group's
job ids come from the status tracker, so the count is exact (AQE
query-stage jobs included).

Usage: PYTHONPATH=/root/repo python tools/count_jobs_incremental.py [sf_dir] [n_batches]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from community_detection_flink_spark import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="inc-jobs", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entry_mod
    from community_detection_flink_spark.operators.incremental import (
        incremental_update, prepare)
    from community_detection_flink_spark.plans.iteration import Materializer
    from community_detection_flink_spark.streaming.incremental_stream import (
        micro_batches, split_bulk_stream)

    e, _, _ = entry_mod._graph(spark, sf_dir)
    tri_full = entry_mod._TRI_CACHE[sf_dir]
    mat = Materializer(spark)
    max_vertex = int(e.agg(F.max(F.greatest("src", "dst"))).first()[0])
    bulk, stream, split = split_bulk_stream(e, 0.8)
    tri_bulk = tri_full.where(
        (F.col("u") < split) & (F.col("v") < split) & (F.col("w") < split)
    )

    def run_group(label, fn):
        sc.setJobGroup(label, label)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        sc.setJobGroup("idle", "idle")
        tracker = sc.statusTracker()
        n_jobs = len(tracker.getJobIdsForGroup(label))
        print(f"{label}: {n_jobs} jobs, {dt:.1f}s", flush=True)
        return out, n_jobs, dt

    state, _, _ = run_group("prepare", lambda: prepare(bulk, mat=mat, tri=tri_bulk))

    totals = {"jobs": 0, "wall": 0.0}
    for i, batch in enumerate(
        micro_batches(stream, split, max_vertex, n_batches)
    ):
        state, nj, dt = run_group(
            f"batch-{i}",
            lambda b=batch, s=state: incremental_update(s, b, mat=mat),
        )
        totals["jobs"] += nj
        totals["wall"] += dt
    print(
        f"TOTAL delta: {totals['jobs']} jobs, {totals['wall']:.1f}s "
        f"({totals['jobs'] / n_batches:.1f} jobs/batch)",
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Interleaved A/B harness for the refinement loop (r12 optimization).

Builds the sf_dir pipeline setup ONCE (edges → triangles → preprocess →
election), then runs ``refine_partition`` repeatedly, alternating the
variant knobs exported by the environment-driven switches in
``operators.refinement`` / ``operators.community`` /
``plans.iteration``.  Interleaving (A,B,A,B,...) is the point: this box
draws up to ±60% on identical code between sessions, so only
same-session alternating draws are comparable.

Usage:
    PYTHONPATH=/root/repo python tools/ab_refine.py [sf_dir] [reps] \
        [KEY=VAL ...]     # each KEY toggled per-rep: rep i uses VAL if i odd

Recognized switches (each read at call time by the named module; an
unknown KEY aborts so the harness never silently A/Bs identical code):

    CDFS_AB_LAZY_OWN_CACHE=1       community.best_movement: LAZY fill of
                                   the `own` cache (the r12 variant;
                                   r13 default is the forced count)
    CDFS_AB_NO_TRI_PERSIST=1       refinement loop: re-read the triangle
                                   parquet every round (pre-r12)
    CDFS_AB_INFER_LANDING_SCHEMA=1 Materializer: inferred-schema landing
                                   read-back (pre-r12)
    CDFS_AB_NO_LIGHT_LANDING=1     Materializer: parquet-land every loop
                                   round (pre-r13; light=localCheckpoint)

Every rep asserts the SAME wcc value and round count — a variant that
changes results fails loudly.
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


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = args[0] if args and "=" not in args[0] else "/root/testdata/sf0.1"
    rest = args[1:] if args and "=" not in args[0] else args
    reps = int(rest[0]) if rest and "=" not in rest[0] else 6
    toggles = dict(kv.split("=", 1) for kv in rest if "=" in kv)
    RECOGNIZED = {
        "CDFS_AB_LAZY_OWN_CACHE",
        "CDFS_AB_NO_TRI_PERSIST",
        "CDFS_AB_INFER_LANDING_SCHEMA",
        "CDFS_AB_NO_LIGHT_LANDING",
    }
    unknown = set(toggles) - RECOGNIZED
    if unknown:
        sys.exit(f"unrecognized A/B switches (no operator reads them): {unknown}")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab-refine", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    mat = Materializer(spark)
    edges = mat(co_purchase_edges(spark, sf_dir), "edges")
    vertex_count = edges.select("src").distinct().count()
    tri = mat(triangles(edges, mat=mat), "tri")
    mat.release()
    vertices, clean_edges = preprocess(edges, mat=mat, tri=tri)
    clean_edges = mat(clean_edges, "clean-edges")
    vertices = mat(vertices, "clean-vertices")
    init = mat(initial_partition(vertices, clean_edges, mat=mat), "init")
    mat.release()
    print(f"setup done ({time.time():.0f})", flush=True)

    results: dict[str, list[float]] = {"A": [], "B": []}
    pinned = None
    for i in range(reps):
        side = "A" if i % 2 == 0 else "B"
        for k, v in toggles.items():
            if side == "B":
                os.environ[k] = v
            else:
                os.environ.pop(k, None)
        label = f"rep{i}-{side}"
        sc.setJobGroup(label, label)
        t0 = time.time()
        best, cs, wcc, cc, rounds = refine_partition(
            init, clean_edges, vertex_count, mat=mat, tri=tri,
        )
        dt = time.time() - t0
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(label))
        sc.setJobGroup("idle", "idle")
        sig = (round(wcc, 9), rounds)
        if pinned is None:
            pinned = sig
        assert sig == pinned, f"variant changed results: {sig} != {pinned}"
        results[side].append(dt)
        print(
            f"{label}: {dt:.1f}s  {n_jobs} jobs ({n_jobs / rounds:.1f}/round) "
            f"wcc={wcc:.6f} rounds={rounds}",
            flush=True,
        )
        mat.drop(best)
        mat.drop(cs)
    for side in ("A", "B"):
        if results[side]:
            xs = sorted(results[side])
            print(
                f"{side}: min={xs[0]:.1f} median={xs[len(xs) // 2]:.1f} "
                f"all={[round(x, 1) for x in xs]}",
                flush=True,
            )


if __name__ == "__main__":
    main()

"""Executor-scaling points for the WCC per-round cost (VERDICT r8 #6).

SCALING.md's cluster-sizing extrapolation claims the ~4s/round session
floor "vanishes with executor count" while the data term scales with
cores.  This tool measures that instead of asserting it: on the 10×
graph (same construction as tools/scale10x.py — ten disjoint
vertex-id-offset copies of the sf0.1 co-purchase edge set), it runs
the pipeline prefix once per core count and times each refinement
round individually.  local[N] is the stand-in for N executor cores:
the scheduling floor per round (driver barriers, landings) is constant
across N, so per-round wall at N cores ≈ floor + data_term/N — three
points make the split measurable.

Usage:
  PYTHONPATH=/root/repo python tools/executor_scaling_wcc.py build
  PYTHONPATH=/root/repo python tools/executor_scaling_wcc.py run <cpus> [rounds]

`build` lands the 10× edge parquet under /tmp/cdfs-exec-scaling once;
each `run` starts a fresh session on local[<cpus>] (fresh JVM — run
one at a time on an idle machine) and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Observation
from pyspark.sql import functions as F

BASE = "/tmp/cdfs-exec-scaling"
SF_DIR = "/root/testdata/sf0.1"


def build():
    from community_detection_flink_spark import get_spark
    from community_detection_flink_spark.sources.edges import co_purchase_edges

    spark = get_spark(app_name="exec-scale-build", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    edges = co_purchase_edges(spark, SF_DIR)
    n_off = edges.agg(F.max(F.greatest("src", "dst"))).first()[0] + 1
    copies = [
        edges.select(
            (F.col("src") + F.lit(k * n_off)).alias("src"),
            (F.col("dst") + F.lit(k * n_off)).alias("dst"),
        )
        for k in range(10)
    ]
    e10 = copies[0]
    for c in copies[1:]:
        e10 = e10.unionByName(c)
    e10.write.mode("overwrite").parquet(f"{BASE}/edges_10x")
    print(f"landed {BASE}/edges_10x", flush=True)


def run(cpus: int, max_rounds: int = 6):
    from community_detection_flink_spark import get_spark
    from community_detection_flink_spark.operators.community import (
        best_movement, community_adjacency, community_stats, global_wcc)
    from community_detection_flink_spark.operators.partition import (
        initial_partition)
    from community_detection_flink_spark.operators.preprocess import preprocess
    from community_detection_flink_spark.operators.triangles import triangles
    from community_detection_flink_spark.plans.iteration import Materializer

    spark = get_spark(app_name=f"exec-scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    mat = Materializer(spark)
    t_start = time.time()
    edges = spark.read.parquet(f"{BASE}/edges_10x")
    vertex_count = edges.select("src").distinct().count()
    tri = mat(triangles(edges, mat=mat), "tri")
    mat.release()
    vertices, clean_edges = preprocess(edges, mat=mat, tri=tri)
    clean_edges = mat(clean_edges, "clean-edges")
    vertices = mat(vertices, "clean-vertices")
    t_prep = time.time() - t_start
    t0 = time.time()
    init = mat(initial_partition(vertices, clean_edges, mat=mat), "init")
    mat.release()
    t_elect = time.time() - t0

    global_cc_total = vertices.agg(F.sum("cc").alias("s")).first()["s"] or 0.0
    global_cc = float(global_cc_total) / float(vertex_count)
    loop_edges = clean_edges.repartition("src").persist()

    def _eval(labels):
        vcd = community_adjacency(labels, loop_edges).persist()
        cs = mat(community_stats(labels, loop_edges, vcd=vcd), "cs")
        wcc = global_wcc(labels, loop_edges, cs, vertex_count, vcd=vcd, tri=tri)
        return vcd, cs, wcc

    best = mat(init, "best")
    t0 = time.time()
    best_vcd, best_cs, best_wcc = _eval(best)
    t_eval0 = time.time() - t0

    round_times = []
    for r in range(max_rounds):
        t0 = time.time()
        obs = Observation()
        moved = mat(
            best_movement(best, loop_edges, best_cs, global_cc, vertex_count,
                          mat=mat, vcd=best_vcd, moves_observation=obs),
            "moved",
        )
        mat.release()
        new_vcd, new_cs, new_wcc = _eval(moved)
        round_times.append(round(time.time() - t0, 2))
        best_vcd.unpersist(False)
        mat.drop(best)
        best, best_cs, best_wcc, best_vcd = moved, new_cs, new_wcc, new_vcd
    # steady-state per-round: mean of rounds 2.. (round 1 carries
    # first-use JIT/codegen warm-up)
    steady = round_times[1:] if len(round_times) > 1 else round_times
    print(json.dumps({
        "cpus": cpus,
        "vertex_count": vertex_count,
        "prep_sec": round(t_prep, 2),
        "election_sec": round(t_elect, 2),
        "eval0_sec": round(t_eval0, 2),
        "round_sec": round_times,
        "per_round_steady": round(sum(steady) / len(steady), 2),
        "wcc": best_wcc,
    }), flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "build":
        build()
    else:
        run(int(sys.argv[2]), int(sys.argv[3]) if len(sys.argv) > 3 else 6)

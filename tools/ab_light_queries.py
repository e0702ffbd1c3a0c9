"""Interleaved A/B of LIGHT vs parquet loop landings on the AQE-on
iterative query family (r13; see plans.Materializer).

A = committed behavior (light in-loop landings), B = pre-r13 parquet
(CDFS_AB_NO_LIGHT_LANDING=1).  Same-session interleaving, result row
counts asserted identical across variants.

Usage: PYTHONPATH=/root/repo python tools/ab_light_queries.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from community_detection_flink_spark import get_spark

QUERIES = [
    "g_sssp_weighted",
    "g_ktruss",
    "g_landmark_distances",
    "g_centrality_approx",
    "g_kcore",
    "g_bfs",
    "g_connected_components",
    "g_components_paths",
    "g_label_propagation",
    "emb_dup_clusters",
    "doc_dedup_groups",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="ab-light", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod
    queries = entry_mod.queries()

    # warm shared session caches once so reps are like-for-like
    for name in QUERIES:
        queries[name](spark, sf_dir).count()

    for name in QUERIES:
        times = {"A": [], "B": []}
        rows = None
        for i in range(reps):
            side = "A" if i % 2 == 0 else "B"
            if side == "B":
                os.environ["CDFS_AB_NO_LIGHT_LANDING"] = "1"
            else:
                os.environ.pop("CDFS_AB_NO_LIGHT_LANDING", None)
            # evict shared derived caches so each rep recomputes the loop
            for c in ("_PAIRS_CACHE", "_KNN_CACHE"):
                getattr(entry_mod, c, {}) and getattr(entry_mod, c).pop(sf_dir, None)
            t0 = time.time()
            n = queries[name](spark, sf_dir).count()
            dt = time.time() - t0
            if rows is None:
                rows = n
            assert n == rows, f"{name}: variant changed rows {n} != {rows}"
            times[side].append(dt)
        print(
            f"{name}: A(light) min={min(times['A']):.2f} {sorted(round(t,2) for t in times['A'])} "
            f"vs B(parquet) min={min(times['B']):.2f} {sorted(round(t,2) for t in times['B'])} "
            f"rows={rows}",
            flush=True,
        )
    os.environ.pop("CDFS_AB_NO_LIGHT_LANDING", None)


if __name__ == "__main__":
    main()

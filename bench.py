"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from community_detection_flink_spark import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

HEADLINE = [
    "wcc_communities",        # full graph pipeline (triangles → MIS → refinement)
    "g_triangle_counts",      # degree-oriented triangle counting
    "rel_pricing_summary",    # scan-heavy aggregation
    "rel_nation_revenue",     # multi-join with broadcast dims
    "doc_minhash_lsh_pairs",  # MinHash LSH dedup
    "doc_simhash",            # SimHash fingerprints
    "emb_cosine_topk",        # brute-force similarity top-k
    "ev_session",             # session windows
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="cdfs-bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.time()
        n = queries[name](spark, sf_dir).count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr, flush=True)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Empirical 10x-beyond-sf0.1 scale points (VERDICT r7 task #5).

The 100 TB claims for the heaviest operators rest on plan-shape
arguments plus the sf0.001->0.1 cross-SF table (SCALING.md).  This
tool adds one more decade for the top-3 heaviest: it synthesizes
10x-sized inputs with the SAME local structure as the sf0.1 driver
data, lands them as parquet (so scans are real scans), and times the
operator at 1x and 10x in the same session (same JVM warm-up, same
caches cold per run).

Scaled inputs:
- graph 10x: ten disjoint vertex-id-offset copies of the sf0.1
  co-purchase edge set.  Holds degree distribution and triangle
  structure exactly fixed while |V|, |E|, and triangle count scale by
  10 — the controlled experiment for per-round cost; disjointness is
  irrelevant to the measured plans (no operator exploits it: every
  shuffle/join/agg runs over the full edge set).
- documents 10x: ten doc_id-offset copies with every 3rd word
  perturbed per copy (JVM-side transform), so cross-copy trigram
  Jaccard collapses and the pair workload keeps the original
  per-copy shape instead of exploding with clone pairs.
- orders 10x: ten orderkey/custkey-offset copies — 10x the chains for
  the path-graph components workload at the same diameter.

Usage: PYTHONPATH=/root/repo python tools/scale10x.py [out_json]
(idle machine only — same caveat as scaling_report.py)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from community_detection_flink_spark import get_spark, run_wcc
from community_detection_flink_spark.operators import components as C
from community_detection_flink_spark.operators import dedup as D
from community_detection_flink_spark.operators.triangles import triangles
from community_detection_flink_spark.operators.preprocess import preprocess
from community_detection_flink_spark.plans.iteration import Materializer
from community_detection_flink_spark.sources.edges import co_purchase_edges
from community_detection_flink_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def _land(df, path):
    df.write.mode("overwrite").parquet(path)
    return path


def build_inputs(spark, base):
    """Land 1x and 10x parquet inputs; returns dict of paths."""
    paths = {}
    edges = co_purchase_edges(spark, SF_DIR)
    n_off = edges.agg(F.max(F.greatest("src", "dst"))).first()[0] + 1
    paths["edges_1x"] = _land(edges, f"{base}/edges_1x")
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
    paths["edges_10x"] = _land(e10, f"{base}/edges_10x")

    docs = load_table(spark, SF_DIR, "documents")
    paths["docs_1x"] = _land(docs, f"{base}/docs_1x")
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    dcopies = []
    for k in range(10):
        mut = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w, i: F.when(
                    i % 3 == F.lit(2), F.concat(w, F.lit(f"~{k}"))
                ).otherwise(w),
            ),
            " ",
        )
        dcopies.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * n_doc)).alias("doc_id"),
                (mut if k else F.col("text")).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    d10 = dcopies[0]
    for c in dcopies[1:]:
        d10 = d10.unionByName(c)
    paths["docs_10x"] = _land(d10, f"{base}/docs_10x")

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    paths["orders_1x"] = _land(orders, f"{base}/orders_1x")
    n_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1
    n_cust = orders.agg(F.max("o_custkey")).first()[0] + 1
    ocopies = [
        orders.select(
            (F.col("o_orderkey") + F.lit(k * n_ord)).alias("o_orderkey"),
            (F.col("o_custkey") + F.lit(k * n_cust)).alias("o_custkey"),
            "o_orderdate",
        )
        for k in range(10)
    ]
    o10 = ocopies[0]
    for c in ocopies[1:]:
        o10 = o10.unionByName(c)
    paths["orders_10x"] = _land(o10, f"{base}/orders_10x")
    return paths


def run_wcc_pipeline(spark, edge_path):
    """Full pipeline: scan -> triangles -> preprocess -> run_wcc.
    Returns (total_s, phase dict, rounds, per_round_s)."""
    mat = Materializer(spark)
    t0 = time.time()
    e = mat(spark.read.parquet(edge_path), "s10-edges")
    tri = mat(triangles(e, mat=mat), "s10-tri")
    vertices, clean = preprocess(e, mat=mat, tri=tri)
    t_pre = time.time() - t0
    t0 = time.time()
    res = run_wcc(e, pre=(tri, mat(vertices, "s10-v"), mat(clean, "s10-ce")))
    res.communities.count()
    t_ref = time.time() - t0
    rounds = res.iterations
    return t_pre + t_ref, {
        "preprocess_s": round(t_pre, 1),
        "refine_s": round(t_ref, 1),
        "rounds": rounds,
        "per_round_s": round(t_ref / max(rounds, 1), 2),
        "n_edges": e.count(),
    }


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    base = tempfile.mkdtemp(prefix="cdfs-scale10x-")
    spark = get_spark(
        app_name="scale10x", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"# landing inputs under {base}", file=sys.stderr, flush=True)
    paths = build_inputs(spark, base)
    results = {}

    for scale in ("1x", "10x"):
        docs = spark.read.parquet(paths[f"docs_{scale}"])
        t0 = time.time()
        n = D.ngram_jaccard_pairs(docs, 0.5, 3).count()
        results[f"jaccard_{scale}"] = {
            "s": round(time.time() - t0, 1), "pairs": n,
            "docs": docs.count(),
        }
        print(f"# jaccard {scale}: {results[f'jaccard_{scale}']}",
              file=sys.stderr, flush=True)

    from pyspark.sql import Window

    for scale in ("1x", "10x"):
        o = spark.read.parquet(paths[f"orders_{scale}"])
        w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        seq = o.select(
            F.col("o_orderkey").alias("v"),
            F.lag("o_orderkey").over(w).alias("u"),
        ).where(F.col("u").isNotNull())
        t0 = time.time()
        n = C.connected_components(
            seq.select("u", "v"), vertices=o.select("o_orderkey")
        ).count()
        results[f"components_paths_{scale}"] = {
            "s": round(time.time() - t0, 1), "rows": n,
        }
        print(f"# components {scale}: {results[f'components_paths_{scale}']}",
              file=sys.stderr, flush=True)

    for scale in ("1x", "10x"):
        total, detail = run_wcc_pipeline(spark, paths[f"edges_{scale}"])
        results[f"wcc_{scale}"] = {"s": round(total, 1), **detail}
        print(f"# wcc {scale}: {results[f'wcc_{scale}']}",
              file=sys.stderr, flush=True)

    for op in ("jaccard", "components_paths", "wcc"):
        r1, r10 = results[f"{op}_1x"], results[f"{op}_10x"]
        results[f"{op}_ratio"] = round(r10["s"] / max(r1["s"], 0.001), 2)
    if "per_round_s" in results["wcc_1x"]:
        results["wcc_per_round_ratio"] = round(
            results["wcc_10x"]["per_round_s"]
            / max(results["wcc_1x"]["per_round_s"], 0.001), 2,
        )
    print(json.dumps(results), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

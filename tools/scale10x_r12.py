"""sf1.0 scale-up probe for the landing-floor amortization claim
(VERDICT r11 #4): run emb_dup_clusters, wcc_communities,
doc_minhash_lsh_pairs, and doc_source_caps_skew at 10x the sf0.1 rows
and record wall vs 1x — turning the "fixed landing/codegen floors
amortize at 100x data" argument that closed r11's emb_dup_clusters
item into a measured scaling exponent.

Scaled inputs hold local structure fixed (same methodology as
tools/scale10x.py):

- graph 10x: ten disjoint vertex-id-offset copies of the sf0.1
  co-purchase edge set (degree distribution + triangle structure
  exactly preserved).
- documents 10x: ten doc_id-offset copies with every 3rd word
  perturbed per copy, so the MinHash band-bucket pair workload keeps
  the per-copy shape instead of exploding with clone pairs; `source`
  is kept, so each source is 10x deeper for the skew-bucketed rank.
- embeddings 10x: ten vec_id-offset copies, copy k's vectors run
  through a deterministic sign-flip pattern (dim i multiplied by
  -1 iff popcount(i & k) is odd — a diagonal ORTHOGONAL transform):
  intra-copy cosines are preserved EXACTLY (the kNN/dup-cluster
  workload shape), while cross-copy near-duplicates collapse.

Usage: PYTHONPATH=/root/repo python tools/scale10x_r12.py [out_json]
(idle machine only — concurrent Spark inflates everything 30-50%)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from community_detection_flink_spark import get_spark, run_wcc
from community_detection_flink_spark.operators import components as C
from community_detection_flink_spark.operators import dedup as D
from community_detection_flink_spark.operators import similarity as S
from community_detection_flink_spark.operators import textual as T
from community_detection_flink_spark.operators.preprocess import preprocess
from community_detection_flink_spark.operators.triangles import triangles
from community_detection_flink_spark.plans.iteration import Materializer
from community_detection_flink_spark.sources.edges import co_purchase_edges
from community_detection_flink_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def _land(df, path):
    df.write.mode("overwrite").parquet(path)
    return path


def build_inputs(spark, base):
    paths = {}
    edges = co_purchase_edges(spark, SF_DIR)
    n_off = edges.agg(F.max(F.greatest("src", "dst"))).first()[0] + 1
    paths["edges_1x"] = _land(edges, f"{base}/edges_1x")
    e10 = edges.select("src", "dst")
    for k in range(1, 10):
        e10 = e10.unionByName(
            edges.select(
                (F.col("src") + F.lit(k * n_off)).alias("src"),
                (F.col("dst") + F.lit(k * n_off)).alias("dst"),
            )
        )
    paths["edges_10x"] = _land(e10, f"{base}/edges_10x")

    docs = load_table(spark, SF_DIR, "documents")
    paths["docs_1x"] = _land(docs, f"{base}/docs_1x")
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    d10 = docs
    for k in range(1, 10):
        mut = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w, i: F.when(
                    i % 3 == F.lit(2), F.concat(w, F.lit(f"~{k}"))
                ).otherwise(w),
            ),
            " ",
        )
        d10 = d10.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(k * n_doc)).alias("doc_id"),
                mut.alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    paths["docs_10x"] = _land(d10, f"{base}/docs_10x")

    emb = load_table(spark, SF_DIR, "embeddings")
    paths["emb_1x"] = _land(emb, f"{base}/emb_1x")
    n_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    e10 = emb
    for k in range(1, 10):
        flip = F.transform(
            F.col("embedding"),
            lambda x, i: (
                x
                * F.when(
                    F.bit_count(i.bitwiseAND(F.lit(k))) % 2 == 1, F.lit(-1.0)
                ).otherwise(F.lit(1.0))
            ).cast("float"),
        )
        e10 = e10.unionByName(
            emb.select(
                (F.col("vec_id") + F.lit(k * n_vec)).alias("vec_id"),
                flip.alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        )
    paths["emb_10x"] = _land(e10, f"{base}/emb_10x")
    return paths


def emb_dup_clusters(spark, emb_path):
    """Mirror of the registry query on a path-parameterized input."""
    from pyspark.sql import Window

    emb = spark.read.parquet(emb_path)
    g = S.knn_graph(emb, k=3)
    pairs = g.where(F.col("cosine") >= 0.25).select("vec_id", "nb_id")
    comp = C.connected_components(pairs, vertices=emb.select("vec_id"))
    assign = comp.select(
        F.col("vId").alias("vec_id"), F.col("comp").alias("cluster_id")
    )
    return assign.select(
        "vec_id",
        "cluster_id",
        F.count("*")
        .over(Window.partitionBy("cluster_id"))
        .cast("long")
        .alias("cluster_size"),
    )


def wcc_pipeline(spark, edge_path):
    mat = Materializer(spark)
    e = mat(spark.read.parquet(edge_path), "s12-edges")
    tri = mat(triangles(e, mat=mat), "s12-tri")
    vertices, clean = preprocess(e, mat=mat, tri=tri)
    res = run_wcc(e, pre=(tri, mat(vertices, "s12-v"), mat(clean, "s12-ce")))
    return res.communities.count(), res.iterations


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else None
    base = tempfile.mkdtemp(prefix="cdfs-scale10x-r12-")
    spark = get_spark(
        app_name="scale10x-r12", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"# landing inputs under {base}", file=sys.stderr, flush=True)
    paths = build_inputs(spark, base)
    results = {}

    for scale in ("1x", "10x"):
        t0 = time.time()
        n = emb_dup_clusters(spark, paths[f"emb_{scale}"]).count()
        results[f"emb_dup_clusters_{scale}"] = {
            "s": round(time.time() - t0, 1), "rows": n,
        }
        print(f"# emb_dup_clusters {scale}: "
              f"{results[f'emb_dup_clusters_{scale}']}",
              file=sys.stderr, flush=True)

    for scale in ("1x", "10x"):
        docs = spark.read.parquet(paths[f"docs_{scale}"])
        t0 = time.time()
        n = D.minhash_lsh_pairs(docs, 8, 4, 3).count()
        results[f"doc_minhash_lsh_pairs_{scale}"] = {
            "s": round(time.time() - t0, 1), "pairs": n,
        }
        print(f"# minhash_lsh_pairs {scale}: "
              f"{results[f'doc_minhash_lsh_pairs_{scale}']}",
              file=sys.stderr, flush=True)

    for scale in ("1x", "10x"):
        docs = spark.read.parquet(paths[f"docs_{scale}"])
        t0 = time.time()
        n = T.source_caps(docs, cap=10, skew_buckets=16).count()
        results[f"doc_source_caps_skew_{scale}"] = {
            "s": round(time.time() - t0, 1), "rows": n,
        }
        print(f"# source_caps_skew {scale}: "
              f"{results[f'doc_source_caps_skew_{scale}']}",
              file=sys.stderr, flush=True)

    for scale in ("1x", "10x"):
        t0 = time.time()
        n, rounds = wcc_pipeline(spark, paths[f"edges_{scale}"])
        results[f"wcc_communities_{scale}"] = {
            "s": round(time.time() - t0, 1), "rows": n, "rounds": rounds,
        }
        print(f"# wcc {scale}: {results[f'wcc_communities_{scale}']}",
              file=sys.stderr, flush=True)

    for q in ("emb_dup_clusters", "doc_minhash_lsh_pairs",
              "doc_source_caps_skew", "wcc_communities"):
        a, b = results[f"{q}_1x"]["s"], results[f"{q}_10x"]["s"]
        results[f"{q}_ratio"] = round(b / a, 2) if a else None
    print("SUMMARY " + json.dumps(results), flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

"""10x scale points for the round-9b operators (SCALING.md evidence).

Same methodology as scale10x.py / scale10x_r8ops.py: synthesize
10x-sized inputs with the same local structure as the sf0.1 driver
data, land as parquet, time 1x vs 10x in one session (min-of-2 after
an untimed warm-up).  The interesting claim per operator is the SHAPE:

- semantic_dedup / knn_graph: embeddings x10 with FIXED-SIZE cells
  (n_cells = n/50) — the production regime where pair volume is
  linear in n (cells x10, pairs-per-cell constant).  The registry
  default n_cells=sqrt(n) is the small-corpus quality choice; its
  pair volume grows n^1.5 and is measured separately as the
  documented non-scale path.
- kmeans_lloyd: k=8, iters=2 fixed — assignment crossJoin and the
  per-dim recenter explode are both linear in n.
- hll_portable / hll_by_group: events x10 with fresh event_ids — a
  single linear pass; the shuffle stays <= 64 rows per group
  regardless of input volume (the whole point of the sketch).
- fuzzy_join_blocked, measured BOTH ways: new blocks per copy
  (p_size offset — the intended scale shape, linear) and same blocks
  (10x rows into unchanged (brand, size) blocks — the documented
  quadratic failure mode when the blocking key stops bounding block
  size).
- char_entropy: docs x10 — linear char explode, the (doc, char)
  aggregate collapses map-side.

Usage: PYTHONPATH=/root/repo python tools/scale10x_r9ops.py [out_json]
(idle machine only)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from community_detection_flink_spark import get_spark
from community_detection_flink_spark.operators.linkage import fuzzy_join_blocked
from community_detection_flink_spark.operators.similarity import (
    kmeans_lloyd,
    knn_graph,
    semantic_dedup,
)
from community_detection_flink_spark.operators.sketches import (
    hll_by_group,
    hll_portable,
)
from community_detection_flink_spark.operators.textual import char_entropy
from community_detection_flink_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def _land(df, path):
    df.write.mode("overwrite").parquet(path)
    return path


def _timed(fn):
    fn().count()  # warm-up, untimed (codegen, broadcast pools)
    runs = []
    n = 0
    for _ in range(2):
        t0 = time.time()
        n = fn().count()
        runs.append(time.time() - t0)
    return round(min(runs), 2), n


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10x_r9ops.json"
    spark = get_spark(app_name="scale10x-r9", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="s10r9-")
    results = {}

    # ---- embeddings x10: per-copy jitter so copies aren't clones ------
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    n_emb = emb.count()
    copies = []
    for k in range(10):
        jit = F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(
                i % 7 == F.lit(k % 7), F.lit(0.001 * (k + 1))
            ).otherwise(F.lit(0.0)),
        )
        copies.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * n_emb)).alias("vec_id"),
                (jit if k else F.col("embedding")).cast("array<float>").alias(
                    "embedding"
                ),
            )
        )
    e10 = copies[0]
    for c in copies[1:]:
        e10 = e10.unionByName(c)
    p1 = _land(emb, f"{base}/emb_1x")
    p10 = _land(e10, f"{base}/emb_10x")
    for tag, p, n in (("1x", p1, n_emb), ("10x", p10, 10 * n_emb)):
        e = spark.read.parquet(p)
        cells = max(4, n // 50)  # fixed-size cells: the linear regime
        t, _ = _timed(lambda: semantic_dedup(e, tau=0.3, n_cells=cells))
        results[f"semdedup_{tag}_s"] = t
        t, _ = _timed(lambda: knn_graph(e, k=3, n_cells=cells))
        results[f"knn_{tag}_s"] = t
        t, _ = _timed(lambda: kmeans_lloyd(e, k=8, iters=2))
        results[f"kmeans_{tag}_s"] = t
    for op in ("semdedup", "knn", "kmeans"):
        results[f"{op}_ratio"] = round(
            results[f"{op}_10x_s"] / results[f"{op}_1x_s"], 2
        )
    # the sqrt(n)-cells default on the 10x corpus: pair volume n^1.5 —
    # recorded so SCALING.md can contrast regimes honestly
    e = spark.read.parquet(p10)
    t, _ = _timed(lambda: semantic_dedup(e, tau=0.3))
    results["semdedup_10x_sqrtcells_s"] = t

    # ---- events x10 (fresh ids): HLL single pass ----------------------
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts")
    ecopies = []
    for k in range(10):
        ecopies.append(
            ev.select(
                (F.col("event_id") + F.lit(k * 10_000_000)).alias("event_id"),
                (F.col("user_id") + F.lit(k * 1_000_000)).alias("user_id"),
                "ts",
            )
        )
    ev10 = ecopies[0]
    for c in ecopies[1:]:
        ev10 = ev10.unionByName(c)
    p1 = _land(ev, f"{base}/ev_1x")
    p10 = _land(ev10, f"{base}/ev_10x")
    for tag, p in (("1x", p1), ("10x", p10)):
        e = spark.read.parquet(p)
        t, _ = _timed(lambda: hll_portable(e, "event_id"))
        results[f"hll_{tag}_s"] = t
        daily = e.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
        )
        t, _ = _timed(lambda: hll_by_group(daily, "user_id", ["day"]))
        results[f"hll_daily_{tag}_s"] = t
    results["hll_ratio"] = round(results["hll_10x_s"] / results["hll_1x_s"], 2)
    results["hll_daily_ratio"] = round(
        results["hll_daily_10x_s"] / results["hll_daily_1x_s"], 2
    )

    # ---- parts x10 both ways: new blocks vs same blocks ---------------
    part = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    n_part = part.count()
    new_b, same_b = [], []
    for k in range(10):
        new_b.append(
            part.select(
                (F.col("p_partkey") + F.lit(k * n_part)).alias("p_partkey"),
                "p_name", "p_brand",
                (F.col("p_size") + F.lit(k * 1000)).alias("p_size"),
            )
        )
        same_b.append(
            part.select(
                (F.col("p_partkey") + F.lit(k * n_part)).alias("p_partkey"),
                "p_name", "p_brand", "p_size",
            )
        )
    pn10, ps10 = new_b[0], same_b[0]
    for c in new_b[1:]:
        pn10 = pn10.unionByName(c)
    for c in same_b[1:]:
        ps10 = ps10.unionByName(c)
    paths = {
        "1x": _land(part, f"{base}/part_1x"),
        "10x_newblocks": _land(pn10, f"{base}/part_10n"),
        "10x_sameblocks": _land(ps10, f"{base}/part_10s"),
    }
    for tag, p in paths.items():
        d = spark.read.parquet(p)
        t, n = _timed(
            lambda: fuzzy_join_blocked(
                d, "p_partkey", "p_name", ["p_brand", "p_size"], 2
            )
        )
        results[f"fuzzy_{tag}_s"] = t
        results[f"fuzzy_{tag}_pairs"] = n
    results["fuzzy_newblocks_ratio"] = round(
        results["fuzzy_10x_newblocks_s"] / results["fuzzy_1x_s"], 2
    )
    results["fuzzy_sameblocks_ratio"] = round(
        results["fuzzy_10x_sameblocks_s"] / results["fuzzy_1x_s"], 2
    )

    # ---- events x10: histogram quantiles (bins add, one pass) ---------
    from community_detection_flink_spark.operators.sketches import (
        histogram_quantiles,
    )

    for tag, p in (("1x", f"{base}/ev_1x"), ("10x", f"{base}/ev_10x")):
        ev_v = spark.read.parquet(p).withColumn(
            "value", (F.col("event_id") % 1000).cast("double")
        )
        t, _ = _timed(lambda: histogram_quantiles(ev_v, "value"))
        results[f"histq_{tag}_s"] = t
    results["histq_ratio"] = round(
        results["histq_10x_s"] / results["histq_1x_s"], 2
    )

    # ---- embeddings x10: kNN edges -> CC clusters ----------------------
    from community_detection_flink_spark.operators import components as CC

    for tag, p, n in (
        ("1x", f"{base}/emb_1x", n_emb),
        ("10x", f"{base}/emb_10x", 10 * n_emb),
    ):
        e = spark.read.parquet(p)
        cells = max(4, n // 50)

        def run_clusters():
            g = knn_graph(e, k=3, n_cells=cells)
            pairs = g.where(F.col("cosine") >= 0.25).select("vec_id", "nb_id")
            return CC.connected_components(pairs, vertices=e.select("vec_id"))

        t, _ = _timed(run_clusters)
        results[f"dupclust_{tag}_s"] = t
    results["dupclust_ratio"] = round(
        results["dupclust_10x_s"] / results["dupclust_1x_s"], 2
    )

    # ---- docs x10: char entropy ---------------------------------------
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    dcopies = [
        docs.select(
            (F.col("doc_id") + F.lit(k * n_doc)).alias("doc_id"), "text"
        )
        for k in range(10)
    ]
    d10 = dcopies[0]
    for c in dcopies[1:]:
        d10 = d10.unionByName(c)
    p1 = _land(docs, f"{base}/docs_1x")
    p10 = _land(d10, f"{base}/docs_10x")
    for tag, p in (("1x", p1), ("10x", p10)):
        d = spark.read.parquet(p)
        t, _ = _timed(lambda: char_entropy(d))
        results[f"entropy_{tag}_s"] = t
    results["entropy_ratio"] = round(
        results["entropy_10x_s"] / results["entropy_1x_s"], 2
    )

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

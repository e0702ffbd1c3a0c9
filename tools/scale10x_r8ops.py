"""10x scale points for the round-8 operators (SCALING.md evidence).

Same methodology as scale10x.py (which covers the three heaviest
operators): synthesize 10x-sized inputs with the same local structure
as the sf0.1 driver data, land as parquet, time 1x vs 10x in one
session.  The round-8 ops are cheap, so the interesting claim is the
SHAPE of the scaling, not the absolute seconds:

- rel_bloom_prune: probes 600k -> 6M while the filter stays 1024 bits
  and the dim side is unchanged — cost must scale ~linearly in probe
  volume with a constant filter build (the broadcast-runtime-filter
  contract).
- doc_phrase_search: docs x10 (every-3rd-word perturbation kills most
  cross-copy phrase hits but keeps ~2/3 of per-term postings), so the
  posting joins carry ~7-10x rows.
- ev_ohlc_bars: events x10 into the SAME (type, hour) buckets — the
  map-side combine should absorb the density increase (shuffle rows
  constant).
- rel_merge_upsert: target x10 with the derived change set scaling
  along — one broadcast join either way.

Usage: PYTHONPATH=/root/repo python tools/scale10x_r8ops.py [out_json]
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
from community_detection_flink_spark.operators.search import phrase_search
from community_detection_flink_spark.operators.sketches import bloom_semi_prune
from community_detection_flink_spark.operators.temporal import ohlc_bars
from community_detection_flink_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def _land(df, path):
    df.write.mode("overwrite").parquet(path)
    return path


def _ten(df, offsets):
    """Union of 10 copies with per-copy column offsets applied."""
    copies = []
    for k in range(10):
        c = df
        for col, step in offsets.items():
            c = c.withColumn(col, F.col(col) + F.lit(k * step))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _timed(fn):
    """Min-of-2 after one untimed warm-up: these operators run in
    hundreds of ms, so first-use costs (codegen, broadcast thread
    pools, parquet footer caches) would otherwise dominate the 1x
    draw and make 10x look FASTER than 1x (observed: bloom 2.12s
    first-ever call vs 0.57s at 10x)."""
    fn().count()  # warm-up, untimed
    runs = []
    n = 0
    for _ in range(2):
        t0 = time.time()
        n = fn().count()
        runs.append(time.time() - t0)
    return round(min(runs), 2), n


def main():
    out_json = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10x_r8ops.json"
    spark = get_spark(app_name="scale10x-r8", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="s10r8-")
    results = {}

    # ---- bloom: probe volume x10, same dim/filter --------------------
    li = load_table(spark, SF_DIR, "lineitem").select("l_suppkey")
    sup = load_table(spark, SF_DIR, "supplier").where(F.col("s_nationkey") < 5)
    sup.write.mode("overwrite").parquet(f"{base}/sup")
    supd = spark.read.parquet(f"{base}/sup")
    p1 = _land(li, f"{base}/li_1x")
    p10 = _land(_ten(li, {}), f"{base}/li_10x")
    for tag, p in (("1x", p1), ("10x", p10)):
        fact = spark.read.parquet(p)
        t, _ = _timed(lambda: bloom_semi_prune(fact, supd))
        results[f"bloom_{tag}_s"] = t
    results["bloom_ratio"] = round(results["bloom_10x_s"] / results["bloom_1x_s"], 2)

    # ---- phrase search: docs x10, every-3rd-word perturbed -----------
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
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
            )
        )
    d10 = dcopies[0]
    for c in dcopies[1:]:
        d10 = d10.unionByName(c)
    p1 = _land(docs, f"{base}/docs_1x")
    p10 = _land(d10, f"{base}/docs_10x")
    for tag, p in (("1x", p1), ("10x", p10)):
        d = spark.read.parquet(p)
        t, n = _timed(lambda: phrase_search(d))
        results[f"phrase_{tag}_s"] = t
        results[f"phrase_{tag}_docs_hit"] = n
    results["phrase_ratio"] = round(
        results["phrase_10x_s"] / results["phrase_1x_s"], 2
    )

    # ---- ohlc: events x10 into the SAME buckets ----------------------
    ev = load_table(spark, SF_DIR, "events")
    p1 = _land(ev, f"{base}/ev_1x")
    p10 = _land(_ten(ev, {"event_id": 10_000_000}), f"{base}/ev_10x")
    for tag, p in (("1x", p1), ("10x", p10)):
        e = spark.read.parquet(p)
        t, n = _timed(lambda: ohlc_bars(e))
        results[f"ohlc_{tag}_s"] = t
        results[f"ohlc_{tag}_bars"] = n
    results["ohlc_ratio"] = round(results["ohlc_10x_s"] / results["ohlc_1x_s"], 2)

    # ---- merge: target x10, derived changes scale along --------------
    from community_detection_flink_spark.operators.merge import merge_upsert

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    p1 = _land(orders, f"{base}/ord_1x")
    p10 = _land(
        _ten(orders, {"o_orderkey": 1_000_000, "o_custkey": 1_000_000}),
        f"{base}/ord_10x",
    )

    def run_merge(tbl):
        key = F.col("o_orderkey")
        ch_d = tbl.where(key % 13 == 0).select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            F.lit("D").alias("op"),
        )
        ch_u = tbl.where((key % 13 != 0) & (key % 7 == 0)).select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            (F.col("o_totalprice") + F.lit(10.0)).alias("o_totalprice"),
            F.lit("U").alias("op"),
        )
        ch_i = tbl.where(key % 17 == 0).select(
            (key + 100_000_000).alias("o_orderkey"), "o_custkey",
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"), F.lit("I").alias("op"),
        )
        return merge_upsert(
            tbl,
            ch_d.unionByName(ch_u).unionByName(ch_i),
            "o_orderkey",
            ["o_custkey", "o_orderstatus", "o_totalprice"],
        )

    for tag, p in (("1x", p1), ("10x", p10)):
        tbl = spark.read.parquet(p)
        t, n = _timed(lambda: run_merge(tbl))
        results[f"merge_{tag}_s"] = t
        results[f"merge_{tag}_rows"] = n
    results["merge_ratio"] = round(
        results["merge_10x_s"] / results["merge_1x_s"], 2
    )

    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

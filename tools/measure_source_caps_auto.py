"""A/B the skew_buckets="auto" mode of textual.source_caps (VERDICT
r11 #8): on BALANCED data auto must cost nothing beyond its one tiny
counting aggregate (it resolves to the unmodified single window); on
the 50%-mega-source fixture it must preserve the bucketed path's
measured win for full-ranking consumers.

Fixtures are the r11 ones (sources/synthetic.skewed_sources, 20M
rows), landed as parquet so scans are real; full ranking is consumed
(count() over all rows AFTER a filter on pick_rank parity, which
defeats WindowGroupLimit pushdown so the entire ranking materializes —
the regime the lever exists for).

Usage: PYTHONPATH=/root/repo python tools/measure_source_caps_auto.py
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
from community_detection_flink_spark.operators.textual import source_caps
from community_detection_flink_spark.sources.synthetic import skewed_sources

N = 20_000_000


def consume_full_ranking(df) -> int:
    # parity filter on pick_rank: consumes the FULL ranking (no
    # WindowGroupLimit pre-prune possible), output still tiny
    return df.where(F.col("pick_rank") % 2 == 0).count()


def run(docs, label, out, **kw):
    best = None
    for _ in range(2):  # min-of-2, same protocol as SCALING.md entries
        t0 = time.time()
        n = consume_full_ranking(source_caps(docs, cap=10, **kw))
        w = time.time() - t0
        best = w if best is None else min(best, w)
    rec = {"variant": label, "min_of_2_s": round(best, 2), "rows_out": n}
    out.append(rec)
    print(json.dumps(rec), flush=True)


def main() -> None:
    base = tempfile.mkdtemp(prefix="cdfs-caps-auto-")
    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    out: list = []
    for name, mega in (("balanced", 0.0), ("mega50", 0.5)):
        skewed_sources(spark, n=N, mega_frac=mega, n_small=200).write.mode(
            "overwrite"
        ).parquet(f"{base}/{name}")
        docs = spark.read.parquet(f"{base}/{name}")
        run(docs, f"{name}/default", out)
        run(docs, f"{name}/buckets16", out, skew_buckets=16)
        run(docs, f"{name}/auto", out, skew_buckets="auto")
    print("SUMMARY " + json.dumps(out), flush=True)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()

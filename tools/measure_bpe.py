"""Measure the BPE learn strategies (VERDICT r11 #3): wall and
per-ACTUAL-merge wall at num_merges in {10, 256, 1024} for the
distributed per-merge loop vs the driver-local delta-maintenance
learn.

Two fixtures:

* the sf0.01 driver corpus — which turns out to have only ~31
  distinct words, so the merge space EXHAUSTS at 106 merges (both
  strategies stop there; recorded as a finding, and why per-merge
  walls divide by merges RETURNED, not requested);
* a synthetic large-vocabulary corpus (100k docs x 50 words drawn
  from a ~200k-word md5-derived vocabulary over the hex alphabet) —
  big enough that 1024 merges never exhaust, which is the regime a
  production tokenizer lives in.

Usage::

    PYTHONPATH=/root/repo python tools/measure_bpe.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

from community_detection_flink_spark import get_spark
from community_detection_flink_spark.operators import bpe as B
from community_detection_flink_spark.sources.tables import load_table

GRID = [10, 256, 1024]


def synth_docs(spark, n_docs=100_000, vocab=200_000, words_per_doc=50):
    """Synthetic corpus with a controlled ~vocab-sized word set: word
    w is a 3-to-12-char prefix of md5(w), documents draw words
    uniformly.  All JVM-side generation."""
    wid = lambda j: (F.col("id") * 37 + F.lit(j * 11 + 1) * 7919) % vocab  # noqa: E731
    word = lambda j: F.substring(  # noqa: E731
        F.md5(wid(j).cast("string")), 1, (3 + wid(j) % 10).cast("int")
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(j) for j in range(words_per_doc)]).alias(
            "text"
        ),
    )


def bench(docs, label, out, strategies=("local", "distributed")):
    for strategy in strategies:
        for m in GRID:
            t0 = time.time()
            n = docs.sparkSession.createDataFrame(
                B.bpe_learn(docs, num_merges=m, strategy=strategy).collect(),
                "rank LONG, left STRING, right STRING, freq LONG",
            ).count()
            w = time.time() - t0
            rec = {
                "fixture": label,
                "strategy": strategy,
                "num_merges": m,
                "merges_returned": n,
                "wall_s": round(w, 2),
                "per_actual_merge_ms": round(1000 * w / max(n, 1), 2),
            }
            out["runs"].append(rec)
            print(json.dumps(rec), flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "runs": []}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    nv = B.word_counts(docs).count()
    print(f"corpus distinct_words={nv}", flush=True)
    out["corpus_distinct_words"] = nv
    B.bpe_learn(docs, num_merges=2, strategy="local").collect()  # warm
    bench(docs, "sf0.01-corpus", out)
    big = synth_docs(spark)
    big.write.mode("overwrite").parquet("/tmp/bpe_big_docs")
    big = spark.read.parquet("/tmp/bpe_big_docs")
    nv = B.word_counts(big).count()
    print(f"synthetic distinct_words={nv}", flush=True)
    out["synthetic_distinct_words"] = nv
    bench(big, "synthetic-200k-vocab", out)
    print("SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

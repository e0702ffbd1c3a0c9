"""Run localized incremental batches in a loop so a profiler can sample
the driver (guide §7.3).  Prints PID first, then per-batch walls.

Usage: PYTHONPATH=/root/repo python tools/localized_batch_once.py [n]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from community_detection_flink_spark import get_spark
from community_detection_flink_spark.operators.incremental import (
    incremental_update,
    prepare,
)
from community_detection_flink_spark.plans.iteration import Materializer
from community_detection_flink_spark.sources.synthetic import clustered_graph
from community_detection_flink_spark.streaming.incremental_stream import (
    localized_batches,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="localized-loop", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    print(f"PYTHON_PID={os.getpid()}", flush=True)

    mat = Materializer(spark)
    g = clustered_graph(spark, 2000, 10)
    state = prepare(g, mat=mat)
    state.vertices.count()
    state.max_vertex = 2000 * 10 - 1
    print("prepare done", flush=True)
    for i, b in enumerate(localized_batches(state, n_batches=n)):
        t0 = time.time()
        state = incremental_update(state, b, mat=mat)
        print(f"batch {i}: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()

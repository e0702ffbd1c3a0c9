"""Dump every Spark job during ONE localized incremental batch (the
clustered fixture — prepare is cheap there), grouped by phase.

Usage: PYTHONPATH=/root/repo python tools/dump_localized_jobs.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

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


def jobs_api(spark):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded"
    ) as r:
        return json.load(r)


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="localized-jobs", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    mat = Materializer(spark)
    g = clustered_graph(spark, 2000, 10)
    state = prepare(g, mat=mat)
    state.vertices.count()
    state.max_vertex = 2000 * 10 - 1

    batches = list(localized_batches(state, n_batches=2))
    # batch 0 untimed (warms JIT); batch 1 dumped
    state = incremental_update(state, batches[0], mat=mat)
    before = {j["jobId"] for j in jobs_api(spark)}
    t0 = time.time()
    state = incremental_update(state, batches[1], mat=mat)
    dt = time.time() - t0
    new = sorted((j for j in jobs_api(spark) if j["jobId"] not in before),
                 key=lambda j: j["jobId"])
    print(f"ONE localized batch: {dt:.1f}s, {len(new)} jobs")
    tot = 0.0
    for j in new:
        dur = 0.0
        try:
            t1 = datetime.strptime(j["submissionTime"].replace("GMT", ""),
                                   "%Y-%m-%dT%H:%M:%S.%f")
            t2 = datetime.strptime(j["completionTime"].replace("GMT", ""),
                                   "%Y-%m-%dT%H:%M:%S.%f")
            dur = (t2 - t1).total_seconds()
        except (KeyError, ValueError):
            pass
        tot += dur
        name = (j.get("name") or "")[:100]
        print(f"  job {j['jobId']:4d} {dur:6.2f}s tasks={j['numTasks']:4d} {name}")
    print(f"sum of job durations: {tot:.1f}s (wall {dt:.1f}s — gap = driver/planning)")


if __name__ == "__main__":
    main()

"""Dump every Spark job (name, duration, tasks) during refinement rounds.

Identifies where the per-round job floor goes: landing writes, broadcast
exchanges, observation actions, cache forcing.

Usage: PYTHONPATH=/root/repo python tools/dump_round_jobs.py [sf_dir] [max_retries]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from community_detection_flink_spark import get_spark
from community_detection_flink_spark.operators.partition import initial_partition
from community_detection_flink_spark.operators.preprocess import preprocess
from community_detection_flink_spark.operators.refinement import refine_partition
from community_detection_flink_spark.operators.triangles import triangles
from community_detection_flink_spark.plans.iteration import Materializer
from community_detection_flink_spark.sources.edges import co_purchase_edges


def jobs_api(spark):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
        return json.load(r)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_retries = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="round-jobs", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    mat = Materializer(spark)
    edges = mat(co_purchase_edges(spark, sf_dir), "edges")
    vertex_count = edges.select("src").distinct().count()
    tri = mat(triangles(edges, mat=mat), "tri")
    mat.release()
    vertices, clean_edges = preprocess(edges, mat=mat, tri=tri)
    clean_edges = mat(clean_edges, "clean-edges")
    vertices = mat(vertices, "clean-vertices")
    init = mat(initial_partition(vertices, clean_edges, mat=mat), "init")
    mat.release()

    before = {j["jobId"] for j in jobs_api(spark)}
    t0 = time.time()
    refine_partition(init, clean_edges, vertex_count, mat=mat, tri=tri,
                     max_retries=max_retries)
    dt = time.time() - t0
    after = jobs_api(spark)
    new = sorted((j for j in after if j["jobId"] not in before),
                 key=lambda j: j["jobId"])
    print(f"refine (max_retries={max_retries}): {dt:.1f}s, {len(new)} jobs")
    for j in new:
        dur = ""
        if j.get("submissionTime") and j.get("completionTime"):
            from datetime import datetime
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                t1 = datetime.strptime(j["submissionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                t2 = datetime.strptime(j["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                dur = f"{(t2 - t1).total_seconds():6.2f}s"
            except ValueError:
                dur = "?"
        name = (j.get("name") or "")[:110]
        print(f"  job {j['jobId']:4d} {dur} tasks={j['numTasks']:4d} {name}")


if __name__ == "__main__":
    main()

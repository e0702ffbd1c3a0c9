"""Aggregate per-stage executor metrics from the live Spark UI REST API.

Local-mode profiling aid for the optimization rounds: call
``snapshot(spark)`` before and after a phase and ``diff_report`` the two
to see where task time actually went (executor compute vs JVM GC vs
shuffle fetch) — the guide's §1.1 empirical loop without leaving the
driver script.

Usage (from another tool)::

    from tools.stage_metrics import snapshot, diff_report
    s0 = snapshot(spark)
    ... run phase ...
    print(diff_report(s0, snapshot(spark), "phase name"))
"""

from __future__ import annotations

import json
import urllib.request

FIELDS = (
    "executorRunTime",       # ms of task run time (all tasks)
    "executorCpuTime",       # ns of on-CPU time
    "jvmGcTime",             # ms inside GC while tasks ran
    "shuffleFetchWaitTime",  # ms blocked on shuffle fetch
    "shuffleWriteTime",      # ns writing shuffle output
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "inputBytes",
    "outputBytes",
    "numTasks",
)


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/{path}") as r:
        return json.load(r)


def snapshot(spark) -> dict:
    """Sum the FIELDS over all completed stages so far (+ stage count)."""
    stages = _api(spark, "stages?status=complete")
    out = {f: 0 for f in FIELDS}
    out["numStages"] = len(stages)
    for st in stages:
        for f in FIELDS:
            out[f] += st.get(f, 0) or 0
    return out


def diff_report(before: dict, after: dict, label: str = "") -> str:
    d = {k: after[k] - before[k] for k in after}
    run_s = d["executorRunTime"] / 1e3
    cpu_s = d["executorCpuTime"] / 1e9
    gc_s = d["jvmGcTime"] / 1e3
    fetch_s = d["shuffleFetchWaitTime"] / 1e3
    swrite_s = d["shuffleWriteTime"] / 1e9
    return (
        f"[{label}] stages={d['numStages']} tasks={d['numTasks']} "
        f"taskRun={run_s:.1f}s cpu={cpu_s:.1f}s gc={gc_s:.1f}s "
        f"fetchWait={fetch_s:.1f}s shufWrite={swrite_s:.1f}s "
        f"shufRead={d['shuffleReadBytes'] / 1e6:.1f}MB "
        f"shufWriteBytes={d['shuffleWriteBytes'] / 1e6:.1f}MB "
        f"input={d['inputBytes'] / 1e6:.1f}MB output={d['outputBytes'] / 1e6:.1f}MB"
    )

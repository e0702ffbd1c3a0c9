"""SparkSession factory with scale-appropriate defaults.

Replaces the reference's remote-environment bootstrap
(``MyMain.scala:20-24`` — hard-coded ``createRemoteEnvironment``): in
Spark the same knob is just ``master``/``spark-submit``, so the engine
only owns the SQL-level tuning defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "community-detection-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the engine.

    Defaults hold on a laptop and on a 1000-executor cluster alike:
    AQE re-plans shuffles at runtime (coalescing + skew-join splitting),
    and the shuffle-partition count is only pinned when the caller asks
    (tests pin 32 to match local[32]).
    """
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Pin the session timezone: temporal operators bucket by
        # to_date()/window() over TIMESTAMP_LTZ columns, and their
        # DuckDB oracles compute over naive timestamps — identical
        # results require a UTC session regardless of host TZ
        # (ADVICE r8: resample_ffill's day bucketing).
        .config("spark.sql.session.timeZone", "UTC")
        # r13 (guide §5 driver): PySpark 4 captures the Python call
        # site on EVERY DataFrame API call for error context
        # (pyspark.errors.utils._with_origin) — measured ~1700
        # traceback inspections per incremental micro-batch on the
        # plan-construction-heavy loops here.  The engine's errors are
        # surfaced through its own operator names; the capture is pure
        # per-call overhead.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # catalog home for bucketed tables (sources/bucketed.py); kept
        # out of the repo tree — on a cluster this is the shared
        # warehouse path instead
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/cdfs-warehouse"),
        )
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return builder.getOrCreate()

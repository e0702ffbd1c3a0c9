"""Parquet star-schema loaders for the driver test tables (TESTDATA.md).

The engine treats these as plain columnar sources: schema comes from
parquet footers, and Catalyst pushes filters/column pruning into the
scan — verify with ``df.explain`` (``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; normalizes nanosecond timestamps.

    Spark 4 rejects parquet TIMESTAMP(NANOS) outright
    (PARQUET_TYPE_ILLEGAL); with ``legacy.parquet.nanosAsLong`` the
    column arrives as raw nanos — converted here to a proper timestamp
    via exact integer division (``div 1000``, no double rounding).
    """
    if name == "events":
        # Scope the legacy nanos decode to this read: flipping the conf
        # session-wide would silently change how any LATER nanosecond
        # parquet column in the same session decodes (bigint instead of
        # a type error).  Save/restore around the scan.
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prior = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            # force schema resolution while the conf is active
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif dict(df.dtypes).get("ts") == "timestamp_ntz":
                # µs-precision parquet without UTC adjustment arrives as
                # TIMESTAMP_NTZ; normalize to TIMESTAMP so strict
                # consumers (unix_micros in the as-of join) resolve and
                # every code path sees one timestamp type
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        finally:
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_star_schema(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table and register each as a temp view (SQL surface)."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

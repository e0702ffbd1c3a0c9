"""profile_table: exact per-column stats and the HLL scale variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from community_detection_flink_spark.operators.profile import profile_table


def test_profile_table_exact_and_approx(spark):
    df = spark.range(100).select(
        "id",
        (F.col("id") % 10).alias("m"),
        F.when(F.col("id") % 7 == 0, None).otherwise(F.col("id")).alias("n"),
    )
    p = {r.column: r for r in profile_table(df).collect()}
    assert set(p) == {"id", "m", "n"}
    assert all(r.n_rows == 100 for r in p.values())
    assert p["id"].n_distinct == 100
    assert (p["id"].min_value, p["id"].max_value) == ("0", "99")
    assert p["m"].n_distinct == 10
    assert p["n"].n_nulls == 15  # 0, 7, ..., 98
    assert p["n"].n_distinct == 85

    pa = {r.column: r for r in profile_table(df, approx=True).collect()}
    assert abs(pa["m"].n_distinct - 10) <= 2  # HLL within rsd
    assert pa["n"].n_nulls == 15              # nulls stay exact

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


def test_sketch_contracts_small(spark):
    from community_detection_flink_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [(i % 100, "g%d" % (i % 4), float(i % 50)) for i in range(2000)],
        "key LONG, grp STRING, val DOUBLE",
    )
    assert SK.distinct_within(df, "key").collect()[0].ok
    assert SK.percentile_within(df, "val", 0.5).collect()[0].ok
    assert SK.hll_merge_within(df, "key", "grp").collect()[0].ok
    assert SK.kll_quantile_within(df, "val", 0.5).collect()[0].ok


def test_sketch_contract_is_sensitive(spark):
    """The boolean really measures: an impossible tolerance must fail."""
    from community_detection_flink_spark.operators import sketches as SK

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "key LONG, val DOUBLE"
    )
    row = SK.percentile_within(df, "val", 0.99, rel_tol=0.0).collect()[0]
    # exact == approx can hold at small n; widen: a NEGATIVE tolerance
    # can never hold unless both are identical AND zero
    row2 = SK.distinct_within(df, "key", rel_tol=-1.0).collect()[0]
    assert row2.ok is False
    assert row.metric.startswith("approx_p99")


def test_cms_heavy_hitters_contract(spark):
    from community_detection_flink_spark.operators import sketches as SK

    # zipf-ish key distribution: key k appears ~2000/(k+1) times
    rows = [(k,) for k in range(50) for _ in range(2000 // (k + 1))]
    df = spark.createDataFrame(rows, "key LONG")
    row = SK.cms_heavy_hitters_within(df, "key", k=5).collect()[0]
    assert row.ok and row.metric == "cms_top5_key_within_eps"

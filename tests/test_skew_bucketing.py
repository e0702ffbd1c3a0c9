"""plans/skew.py + sources/bucketed.py: results identical to the plain
operators, and the plan shapes that motivate them actually appear
(salted join key; no Exchange between two co-bucketed scans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from community_detection_flink_spark.plans.explain import formatted_plan
from community_detection_flink_spark.plans.skew import salted_agg, salted_join
from community_detection_flink_spark.sources.bucketed import (
    bucket_count,
    read_bucketed,
    write_bucketed,
)


def _skewed(spark):
    # one hot key (0) carrying 80% of rows + a long tail
    return spark.range(5000).select(
        F.when(F.col("id") % 5 < 4, 0).otherwise(F.col("id") % 97).alias("k"),
        (F.col("id") * 3 % 11).cast("double").alias("x"),
        F.col("id").alias("id"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    got = salted_agg(
        df,
        ["k"],
        {"n": ("x", "count"), "s": ("x", "sum"), "mn": ("x", "min"), "mx": ("x", "max")},
        n_salt=8,
    )
    want = df.groupBy("k").agg(
        F.count("x").alias("n"),
        F.sum("x").alias("s"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.range(97).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    ).where("k % 2 = 0 OR k = 0")
    from collections import Counter

    for how in ("inner", "left"):
        got = salted_join(big, small, ["k"], n_salt=4, how=how)
        want = big.join(small, ["k"], how)
        # Counter multiset: left-join rows carry None, which doesn't sort
        assert Counter(map(tuple, got.select("k", "id", "v").collect())) == Counter(
            map(tuple, want.select("k", "id", "v").collect())
        ), how
    # the salt is part of the physical join key
    assert "_cdfs_salt" in formatted_plan(salted_join(big, small, ["k"], n_salt=4))


def test_bucketed_join_has_no_exchange(spark):
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("a")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("b")
    )
    write_bucketed(left, "bkt_left", ["k"], 8, sort_keys=["k"])
    write_bucketed(right, "bkt_right", ["k"], 8, sort_keys=["k"])
    l, r = read_bucketed(spark, "bkt_left"), read_bucketed(spark, "bkt_right")
    # force sort-merge (broadcast would hide the co-location win)
    joined = l.hint("merge").join(r, "k")
    plan = formatted_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert joined.count() == 10_000

    # groupBy on the bucket key also skips its exchange
    agg_plan = formatted_plan(l.groupBy("k").agg(F.sum("a")))
    assert "Exchange" not in agg_plan, agg_plan


def test_bucket_count_power_of_two():
    assert bucket_count(1) == 1
    assert bucket_count(900 << 20) == 8          # 900 MB -> 8 buckets
    assert bucket_count(100 << 30) == 1024       # 100 GB -> 1024

"""Round-12 hardening: the r11 ADVICE findings pinned as tests —
NULL CDC op codes rejected (not silently dropped), and bpe_learn
leaving zero checkpoint landings behind.
"""

from __future__ import annotations

import os

import pytest


def test_apply_cdc_batch_rejects_null_op(spark, golden_edges):
    """op=NULL must be an ERROR like any unknown code: the pre-fix
    guard's ~isin('I','D','U') evaluated to NULL for NULL, so the row
    slipped past the probe and was then silently discarded by all
    three I/D/U filters."""
    from community_detection_flink_spark.operators.incremental import prepare
    from community_detection_flink_spark.sources.edges import symmetrize_edges
    from community_detection_flink_spark.streaming.incremental_stream import (
        apply_cdc_batch,
    )

    state = prepare(symmetrize_edges(golden_edges))
    batch = spark.createDataFrame(
        [(1, 2, "I"), (3, 4, None)], "src LONG, dst LONG, op STRING"
    )
    with pytest.raises(ValueError, match="unknown op None"):
        apply_cdc_batch(state, batch)


def test_bpe_learn_drops_all_vocab_landings(spark):
    """The returned merges DataFrame is built from a driver-local
    list, so no parquet landing backs it — every per-iteration vocab
    checkpoint (initial AND final included) must be deleted by the
    time bpe_learn returns (the pre-fix loop leaked two vocab-sized
    landings per call)."""
    from community_detection_flink_spark.operators.bpe import bpe_learn
    from community_detection_flink_spark.plans.iteration import Materializer

    docs = spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "new newer newest low")],
        "doc_id LONG, text STRING",
    )
    mat = Materializer(spark)
    try:
        merges = bpe_learn(docs, num_merges=3, mat=mat)
        assert merges.count() == 3
        left = [
            d
            for d in os.listdir(mat.base)
            if os.path.isdir(os.path.join(mat.base, d))
        ]
        assert left == [], f"leaked checkpoint landings: {left}"
    finally:
        mat.cleanup()


def test_source_caps_auto_picks_single_window_on_balanced(spark):
    """auto with no source above the target leaves the plan the
    UNMODIFIED single window (no bucket key anywhere) and the result
    identical to the default path."""
    from community_detection_flink_spark.operators.textual import source_caps
    from community_detection_flink_spark.sources.synthetic import skewed_sources

    docs = skewed_sources(spark, n=5_000, mega_frac=0.0, n_small=23)
    auto = source_caps(docs, cap=5, skew_buckets="auto")
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "_b" not in plan
    a = {tuple(r) for r in source_caps(docs, cap=5).collect()}
    assert {tuple(r) for r in auto.collect()} == a


def test_source_caps_auto_buckets_the_mega_source(spark):
    """auto with a source past the target activates the bucketed path
    (bucket key in the window spec) and stays hash-identical."""
    from community_detection_flink_spark.operators.textual import source_caps
    from community_detection_flink_spark.sources.synthetic import skewed_sources

    skew = skewed_sources(spark, n=20_000, mega_frac=0.5, n_small=37)
    auto = source_caps(
        skew, cap=7, skew_buckets="auto", auto_target_rows=1_000
    )
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "_b" in plan
    a = {tuple(r) for r in source_caps(skew, cap=7).collect()}
    assert {tuple(r) for r in auto.collect()} == a and len(a) == 20_000


def test_source_caps_rejects_unknown_mode(spark):
    from community_detection_flink_spark.operators.textual import source_caps
    from community_detection_flink_spark.sources.synthetic import skewed_sources

    docs = skewed_sources(spark, n=100, mega_frac=0.0, n_small=5)
    with pytest.raises(ValueError, match="unknown skew_buckets"):
        source_caps(docs, skew_buckets="magic")

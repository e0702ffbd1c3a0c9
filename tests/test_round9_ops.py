"""Round-9 operators: portable Count-Min sketch + mixture sampling.

Property coverage beyond the gate oracles: the CMS one-sided error
contract under forced collisions, mixture-quota saturation, restart
determinism, degenerate inputs, and JVM-only plan pins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from community_detection_flink_spark.operators.sketches import cms_portable_topk
from community_detection_flink_spark.operators.textual import mixture_sample
from community_detection_flink_spark.plans.explain import python_eval_nodes


def _skewed_events(spark):
    # key i appears (50 - i) times for i in 0..49 → unambiguous top-k
    rows = [(k,) for k in range(50) for _ in range(50 - k)]
    return spark.createDataFrame(rows, "user_id LONG")


def test_cms_never_undercounts_even_saturated(spark):
    df = _skewed_events(spark)
    # width=4 forces ~12 keys per counter — heavy collisions; the
    # one-sided CMS contract (estimate >= exact) must still hold
    out = cms_portable_topk(df, "user_id", k=10, width=4).collect()
    assert len(out) == 10
    assert all(r["overcount"] >= 0 for r in out)
    assert all(r["cms_n"] >= r["exact_n"] for r in out)
    # top-10 by construction: keys 0..9 with counts 50..41
    got = {r["key"]: r["exact_n"] for r in out}
    assert got == {k: 50 - k for k in range(10)}


def test_cms_wide_sketch_is_nearly_exact(spark):
    df = _skewed_events(spark)
    # 50 keys into 4x1024 counters → collisions are improbable and the
    # min over 4 rows removes any stragglers
    out = cms_portable_topk(df, "user_id", k=10, width=1024).collect()
    assert all(r["overcount"] == 0 for r in out)


def test_cms_empty_input(spark):
    df = spark.createDataFrame([], "user_id LONG")
    assert cms_portable_topk(df, "user_id").count() == 0


def test_cms_stays_jvm_side(spark):
    df = _skewed_events(spark)
    assert python_eval_nodes(cms_portable_topk(df, "user_id")) == []


def _docs(spark, sizes):
    # sizes: {source: n_docs}; doc_ids globally unique
    rows, i = [], 0
    for src, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, f"text {i}", "en", src, 10 + i % 7))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )


def test_mixture_quota_saturation_visible(spark):
    # src9 carries 10/11 of the weight but only 3 docs — its quota
    # saturates (accept-all) and the shortfall stays visible, while
    # src0 (weight 1/11) gets a small quota out of its 200 docs
    docs = _docs(spark, {"src0": 200, "src9": 3})
    out = {r["source"]: r for r in mixture_sample(docs).collect()}
    s9 = out["src9"]
    assert s9["n_sampled"] == s9["n_docs"] == 3
    assert s9["quota"] > s9["n_docs"]  # the shortfall: quota unmet
    s0 = out["src0"]
    assert 0 <= s0["n_sampled"] <= s0["n_docs"]
    assert s0["quota"] < s0["n_docs"]


def test_mixture_deterministic_across_runs(spark):
    docs = _docs(spark, {"src1": 97, "src2": 41, "src3": 113})
    a = sorted(map(tuple, mixture_sample(docs).collect()))
    b = sorted(map(tuple, mixture_sample(docs).collect()))
    assert a == b


def test_mixture_sample_tracks_quota(spark):
    # uniform sources, enough docs: binomial noise around each quota
    docs = _docs(spark, {f"src{i}": 300 for i in range(4)})
    for r in mixture_sample(docs).collect():
        assert abs(r["n_sampled"] - r["quota"]) <= 45, r  # ~3 sigma
        assert r["n_sampled"] <= r["n_docs"]


def test_mixture_empty_input(spark):
    docs = _docs(spark, {})
    assert mixture_sample(docs).count() == 0


def test_mixture_stays_jvm_side(spark):
    docs = _docs(spark, {"src1": 5})
    assert python_eval_nodes(mixture_sample(docs)) == []

"""Repetition stats + stratified sampling edge cases."""

from __future__ import annotations

import pytest

from community_detection_flink_spark.operators import textual as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a a a a a a a a a a"),                 # one token repeated
        (1, "the quick brown fox jumps over dogs"),  # all distinct
        (2, "go go go stop go go go stop go go"),    # heavy bigram mode
        (3, ""),                                     # empty
        (4, "one"),                                  # no bigrams/trigrams
        (5, "x y x y x y x y"),                      # alternating pair
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_extremes(spark, docs):
    r = {row.doc_id: row for row in T.repetition_stats(docs).collect()}
    assert len(r) == 6
    # doc 0: 10 tokens, 1 distinct -> dup_word 0.9; bigrams all "a a"
    assert abs(r[0].dup_word_frac - 0.9) < 1e-12
    assert r[0].top_bigram_frac == 1.0
    assert r[0].dup_trigram_frac == pytest.approx(1 - 1 / 8)
    assert r[0].flagged
    # doc 1: everything distinct
    assert r[1].dup_word_frac == 0.0
    assert r[1].top_bigram_frac == pytest.approx(1 / 6)
    assert r[1].dup_trigram_frac == 0.0
    assert not r[1].flagged
    # empty + single-token docs: all ratios 0, unflagged
    for d in (3, 4):
        assert r[d].dup_word_frac == 0.0
        assert r[d].top_bigram_frac == 0.0
        assert r[d].dup_trigram_frac == 0.0
        assert not r[d].flagged
    # doc 2: "go go" dominates
    assert r[2].flagged
    # doc 5: "x y" appears 4 of 7 bigrams
    assert r[5].top_bigram_frac == pytest.approx(4 / 7)


def test_stratified_sample_exact_quota(spark):
    rows = [(i, f"s{i % 3}", "t") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = T.stratified_sample(docs, 5).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    assert set(by_key) == {"s0", "s1", "s2"}
    for key, sampled in by_key.items():
        assert sorted(r.rank for r in sampled) == [1, 2, 3, 4, 5]
    # deterministic: same result on re-run
    again = {(r.doc_id, r.key, r.rank) for r in T.stratified_sample(docs, 5).collect()}
    assert again == {(r.doc_id, r.key, r.rank) for r in out}


def test_stratified_sample_small_groups_keep_all(spark):
    rows = [(i, "only", "t") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = T.stratified_sample(docs, 10).collect()
    assert {r.doc_id for r in out} == {0, 1, 2}


def test_cross_corpus_near_dups_finds_planted(spark):
    from community_detection_flink_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [
            (10, base + " extra tail words here"),          # near-dup of ref 1
            (11, "completely different content about graph engines and parquet"),
            (12, base),                                      # exact text of ref 1
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(1, base), (2, "unrelated reference text nothing shared")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.ref_id) for r in
           D.cross_corpus_near_dups(corpus, ref, 8, 4, 3, 0.5).collect()}
    assert (12, 1) in out          # identical text always collides + verifies
    assert (10, 1) in out          # high-overlap near-dup
    assert all(ref_id != 2 for _, ref_id in out)
    assert all(doc != 11 for doc, _ in out)

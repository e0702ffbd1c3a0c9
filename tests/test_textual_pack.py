"""pack_chunks: span arithmetic, shard isolation, empty-doc handling."""

from __future__ import annotations

from community_detection_flink_spark.operators.textual import pack_chunks


def test_pack_chunks_spans(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),                 # 3 tokens: [0, 3)
            (2, "t t t t t t t", "s1"),         # 7 tokens: [3, 10) — crosses 2 chunk borders
            (3, "x y", "s2"),                   # own shard restarts offsets
            (4, "   ", "s2"),                   # whitespace-only: no tokens, dropped
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    got = {
        (r.doc_id, r.shard, r.chunk_id, r.tok_start, r.tok_end)
        for r in pack_chunks(docs, capacity=4, shard_col="source").collect()
    }
    want = {
        (1, "s1", 0, 0, 3),
        (2, "s1", 0, 3, 4),
        (2, "s1", 1, 4, 8),
        (2, "s1", 2, 8, 10),
        (3, "s2", 0, 0, 2),
    }
    assert got == want


def test_pack_chunks_exact_boundary(spark):
    # a doc ending exactly on a chunk border must not spill a zero-width
    # span into the next chunk
    docs = spark.createDataFrame(
        [(1, "a b c d", "s"), (2, "e f", "s")],
        "doc_id LONG, text STRING, source STRING",
    )
    got = sorted(
        (r.doc_id, r.chunk_id, r.tok_start, r.tok_end)
        for r in pack_chunks(docs, capacity=4, shard_col="source").collect()
    )
    assert got == [(1, 0, 0, 4), (2, 1, 4, 6)]


def test_contamination_flags(spark):
    from community_detection_flink_spark.operators.textual import (
        contamination_flags,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta", "b")],
        "doc_id LONG, text STRING, source STRING",
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta", "c"),  # shares 2 5-grams
            (2, "completely different words with no overlap at all", "c"),
            (3, "alpha beta gamma delta", "c"),  # < 5 tokens of overlap run
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    got = {
        r.doc_id: (r.contaminated, r.n_shared)
        for r in contamination_flags(corpus, bench, 5).collect()
    }
    assert got == {1: (True, 2), 2: (False, 0), 3: (False, 0)}

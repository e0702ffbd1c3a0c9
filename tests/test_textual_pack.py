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


def test_pii_scrub_redacts(spark):
    from community_detection_flink_spark.operators.textual import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "mail me at john.doe+x@ex-ample.co.uk or a@b.io now"),
            (2, "card 1234567890 pin 12345 ok 999999"),
            (3, "clean text, no pii at all"),
            (4, ""),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (got[1].n_emails, got[1].n_longnums) == (2, 0)
    assert got[1].clean_text == "mail me at <EMAIL> or <EMAIL> now"
    # 12345 is below the 6-digit floor and survives
    assert (got[2].n_emails, got[2].n_longnums) == (0, 2)
    assert got[2].clean_text == "card <NUM> pin 12345 ok <NUM>"
    assert (got[3].n_emails, got[3].n_longnums) == (0, 0)
    assert got[3].clean_text == "clean text, no pii at all"
    assert got[4].clean_text == ""
    import hashlib

    for r in got.values():  # fingerprint = md5 of the scrubbed text
        assert r.scrub_md5 == hashlib.md5(r.clean_text.encode()).hexdigest()


def test_sliding_word_chunks_shapes(spark):
    """Window/stride arithmetic: overlap, tail windows, short docs."""
    from community_detection_flink_spark.operators.textual import (
        sliding_word_chunks,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(100))),  # 100 words
            (2, "a b c"),                                 # shorter than one window
            (3, "solo"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = sliding_word_chunks(docs, chunk_words=40, stride=30).collect()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(
            (r["chunk_no"], r["start_word"], r["n_words"])
        )
    # 100 words, stride 30 -> starts 0,30,60,90; window 40 clamps tails
    assert sorted(by[1]) == [(0, 0, 40), (1, 30, 40), (2, 60, 40), (3, 90, 10)]
    assert sorted(by[2]) == [(0, 0, 3)]
    assert sorted(by[3]) == [(0, 0, 1)]
    # overlap: chunk k shares its last 10 words with chunk k+1's head
    txt = {r["chunk_no"]: r["chunk_md5"] for r in rows if r["doc_id"] == 1}
    assert len(set(txt.values())) == 4  # all chunks distinct

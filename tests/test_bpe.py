"""Distributed BPE training (r11) — pure-Python differential oracle.

The learn loop is iterative and data-dependent (each argmax depends on
the previous merge), so like the WCC family it is pinned against an
independent reference implementation of the SAME algorithm (Sennrich
et al. 2016 with deterministic tie-breaking) run driver-side — merges
must match exactly, not approximately.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

from community_detection_flink_spark.operators import bpe as B

SF_DIR = "/root/testdata/sf0.001"


def ref_bpe(word_counts: dict[str, int], num_merges: int):
    """Reference BPE: same tokenization (chars + </w>), same greedy
    non-overlapping application, same (freq desc, pair lex asc)
    tie-break."""
    vocab = {
        tuple(list(w) + [B.END]): n for w, n in word_counts.items()
    }
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for toks, n in vocab.items():
            for x, y in zip(toks, toks[1:]):
                pairs[(x, y)] += n
        if not pairs:
            break
        (a, b), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, freq))
        new_vocab: dict[tuple, int] = {}
        for toks, n in vocab.items():
            out, carry = [], None
            for x in toks:
                if carry is None:
                    carry = x
                elif carry == a and x == b:
                    out.append(a + b)
                    carry = None
                else:
                    out.append(carry)
                    carry = x
            if carry is not None:
                out.append(carry)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def _words_of(rows):
    wc: Counter = Counter()
    for (text,) in rows:
        for w in text.lower().split():
            if w:
                wc[w] += 1
    return dict(wc)


def test_bpe_learn_matches_reference_small(spark):
    rows = [
        ("the cat sat on the mat",),
        ("the bat and the rat",),
        ("banana bandana",),
        ("aaaa aaaa aa",),  # self-overlapping runs: the greedy edge case
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, (t,) in enumerate(rows)], "doc_id LONG, text STRING"
    )
    got = [
        (r.rank, r.left, r.right, r.freq)
        for r in B.bpe_learn(docs, num_merges=8).orderBy("rank").collect()
    ]
    want = ref_bpe(_words_of(rows), 8)
    assert got == want and len(got) == 8


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_bpe_learn_matches_reference_corpus(spark):
    from community_detection_flink_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    got = [
        (r.rank, r.left, r.right, r.freq)
        for r in B.bpe_learn(docs, num_merges=6).orderBy("rank").collect()
    ]
    rows = [(r.text,) for r in docs.collect()]
    want = ref_bpe(_words_of(rows), 6)
    assert got == want and len(got) == 6


def test_bpe_encode_compresses_and_counts(spark):
    docs = spark.createDataFrame(
        [(0, "aa aa aa"), (1, "ab ab")], "doc_id LONG, text STRING"
    )
    merges = [
        (r.left, r.right)
        for r in B.bpe_learn(docs, num_merges=2).orderBy("rank").collect()
    ]
    out = {r.doc_id: r for r in B.bpe_encode(docs, merges).collect()}
    assert out[0].n_words == 3 and out[1].n_words == 2
    # with 2 learned merges the 'aa</w>' words collapse below the raw
    # char+marker count (3 symbols each raw)
    assert out[0].n_tokens < 3 * 3


def test_merge_fold_greedy_nonoverlap(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(["a", "a", "a", "a", "a"],), (["a", "b", "a", "b", "a"],), ([],)],
        "toks ARRAY<STRING>",
    )
    got = [r[0] for r in df.select(B._merge_fold(F.col("toks"), "a", "a")).collect()]
    assert got[0] == ["aa", "aa", "a"]
    assert got[1] == ["a", "b", "a", "b", "a"]
    assert got[2] == []


def test_bpe_strategies_agree_small(spark):
    """The driver-local delta-maintenance learn and the distributed
    per-merge loop must produce IDENTICAL merges — same argmax, same
    tie-breaks, same greedy application (VERDICT r11 #3)."""
    rows = [
        ("the cat sat on the mat",),
        ("the bat and the rat",),
        ("banana bandana",),
        ("aaaa aaaa aa",),
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, (t,) in enumerate(rows)], "doc_id LONG, text STRING"
    )
    loc = [
        (r.rank, r.left, r.right, r.freq)
        for r in B.bpe_learn(docs, num_merges=8, strategy="local")
        .orderBy("rank")
        .collect()
    ]
    dist = [
        (r.rank, r.left, r.right, r.freq)
        for r in B.bpe_learn(docs, num_merges=8, strategy="distributed")
        .orderBy("rank")
        .collect()
    ]
    assert loc == dist == ref_bpe(_words_of(rows), 8)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_bpe_strategies_agree_corpus(spark):
    from community_detection_flink_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    loc = [
        (r.rank, r.left, r.right, r.freq)
        for r in B.bpe_learn(docs, num_merges=16, strategy="local")
        .orderBy("rank")
        .collect()
    ]
    dist = [
        (r.rank, r.left, r.right, r.freq)
        for r in B.bpe_learn(docs, num_merges=16, strategy="distributed")
        .orderBy("rank")
        .collect()
    ]
    assert loc == dist and len(loc) == 16


def test_bpe_learn_rejects_unknown_strategy(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="unknown strategy"):
        B.bpe_learn(docs, strategy="magic")


def test_local_learn_property_matches_reference():
    """Property: the delta-maintenance + lazy-heap learn equals the
    recompute-everything reference on random word multisets — the
    invariants under test are exactly the ones delta updates can
    silently break (stale heap entries, stale occurrence-index hits,
    pairs whose count returns to a previous value)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from community_detection_flink_spark.operators.bpe import (
        END,
        _learn_over_vocab,
    )

    words = st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(words, st.integers(min_value=1, max_value=24))
    def check(wc, m):
        rows = [(n, list(w) + [END]) for w, n in wc.items()]
        assert _learn_over_vocab(rows, m) == ref_bpe(wc, m)

    check()

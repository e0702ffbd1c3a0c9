"""containment_pairs and winnowing_fingerprints: exact semantics on
hand-checkable fixtures plus a brute-force parity check for winnowing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from community_detection_flink_spark.operators.dedup import containment_pairs
from community_detection_flink_spark.operators.textual import (
    winnowing_fingerprints,
)


def test_containment_subset_is_asymmetric(spark):
    # doc 1's unigram set {a,b,c} ⊂ doc 2's {a..f}: C(1,2)=1.0 but
    # C(2,1)=0.5 < t — the pair must appear in ONE direction only.
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e f"), (3, "x y z")],
        "doc_id LONG, text STRING",
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(docs, threshold=0.8, shingle_n=1).collect()
    }
    assert got == {(1, 2): 1.0}


def test_containment_counts_distinct_shingles(spark):
    # repeated tokens collapse: doc 1 = {a,b}, doc 2 = {a,b,c};
    # C(1,2) = 2/2 = 1.0 regardless of multiplicity.
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c")], "doc_id LONG, text STRING"
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(docs, threshold=0.9, shingle_n=1).collect()
    }
    assert got == {(1, 2): 1.0}


def test_containment_threshold_filters(spark):
    # doc 1 = {a,b,c,d}, doc 2 = {a,b,x,y}: C = 2/4 = 0.5 both ways —
    # below t=0.6, so no pairs at all.
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y")], "doc_id LONG, text STRING"
    )
    assert containment_pairs(docs, threshold=0.6, shingle_n=1).count() == 0


def test_containment_trigrams_near_identical(spark):
    # identical texts: every trigram shared, C = 1.0 in BOTH directions
    # (ordered-pair output).
    docs = spark.createDataFrame(
        [(1, "p q r s t u"), (2, "p q r s t u")],
        "doc_id LONG, text STRING",
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(docs, threshold=0.6, shingle_n=3).collect()
    }
    assert got == {(1, 2): 1.0, (2, 1): 1.0}


def _brute_winnow(hashes: list[int], w: int) -> set[tuple[int, int]]:
    """Reference implementation: rightmost min of every length-w window
    (one truncated whole-list window if len < w); 1-based positions."""
    n = len(hashes)
    sel = set()
    if n == 0:
        return sel
    starts = range(max(n - w + 1, 1))
    for j in starts:
        window = hashes[j : j + w]
        m = min(window)
        # rightmost occurrence of the minimum
        off = max(i for i, h in enumerate(window) if h == m)
        sel.add((j + off + 1, m))
    return sel


def test_winnowing_matches_bruteforce(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "a b c d e f g h i j k l m n o p"),
            (3, "short doc"),          # fewer tokens than k → 1 shingle
            (4, "one two three four"),  # exactly k tokens → 1 position
        ],
        "doc_id LONG, text STRING",
    )
    k, w = 4, 8
    # pull the engine's own k-gram hashes per position, then winnow
    # them with the 10-line reference implementation above
    from community_detection_flink_spark.operators.dedup import (
        _hash60,
        shingles_col,
    )

    sh = (
        docs.select(
            "doc_id",
            F.posexplode(shingles_col(F.col("text"), k)).alias("pos0", "s"),
        )
        .select("doc_id", "pos0", _hash60(F.col("s")).alias("g"))
        .collect()
    )
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in sh:
        by_doc.setdefault(r.doc_id, []).append((r.pos0, r.g))
    want = set()
    for doc_id, rows in by_doc.items():
        hashes = [g for _, g in sorted(rows)]
        want |= {(doc_id, p, fp) for p, fp in _brute_winnow(hashes, w)}

    got = {
        (r.doc_id, r.pos, r.fp)
        for r in winnowing_fingerprints(docs, k=k, w=w).collect()
    }
    assert got == want


def test_winnowing_coverage_guarantee(spark):
    # the paper's guarantee: every run of w consecutive k-gram
    # positions contains at least one selected fingerprint
    text = " ".join(f"tok{i % 13}x{i % 7}" for i in range(200))
    docs = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    k, w = 4, 8
    n_pos = 200 - k + 1
    sel = sorted(
        r.pos for r in winnowing_fingerprints(docs, k=k, w=w).collect()
    )
    assert sel[0] <= w and sel[-1] >= n_pos - w + 1
    # a gap of more than w between consecutive selections would leave
    # some w-window with no fingerprint — violating the guarantee
    assert all(b - a <= w for a, b in zip(sel, sel[1:]))

"""Connected components (large-star/small-star) + dedup grouping.

The operator's exactness on the driver-checked query path is pinned by
the ``doc_dedup_groups`` recursive-CTE oracle; these fixtures pin the
shapes that query can't reach: multi-hop chains (diameter > log rounds),
isolated vertices, and banded-SimHash == naive equivalence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from community_detection_flink_spark.operators import dedup as D
from community_detection_flink_spark.operators.components import (
    connected_components,
    dedup_groups,
)


def _assignments(df):
    return {r["vId"]: r["comp"] for r in df.collect()}


def test_cliques_path_isolated(spark):
    # clique {0,1,2}, path 10-11-12-13-14 (diameter 4), isolated 99
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (12, 13), (13, 14)]
    e = spark.createDataFrame(edges, "src LONG, dst LONG")
    v = spark.createDataFrame([(99,)], "vId LONG")
    got = _assignments(connected_components(e, vertices=v))
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 99: 99}


def test_long_path_converges_under_round_cap(spark):
    """A 64-vertex path has diameter 63 — label propagation would need
    63 rounds; star contraction must finish well under the cap."""
    n = 64
    e = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src LONG, dst LONG")
    got = _assignments(connected_components(e, max_rounds=12))
    assert got == {i: 0 for i in range(n)}


def test_duplicate_and_reversed_edges_are_harmless(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 2), (5, 4)], "src LONG, dst LONG"
    )
    got = _assignments(connected_components(e))
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_dedup_groups_transitive(spark):
    """a~b and b~c (never a~c directly) must land in ONE group."""
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id LONG, text STRING"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "doc_a LONG, doc_b LONG")
    rows = {r["doc_id"]: (r["group_id"], r["group_size"]) for r in
            dedup_groups(docs, pairs).collect()}
    assert rows == {
        0: (0, 3), 3: (0, 3), 5: (0, 3),
        1: (1, 1), 2: (2, 1), 4: (4, 1),
    }


def test_simhash_banded_equals_naive(spark):
    """Banded pigeonhole candidates + exact verify == naive all-pairs
    Hamming scan (no false negatives from the banding)."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "the quick brown fox leaps over the lazy dog",
        "completely different words entirely here now",
        "another unrelated document about spark engines",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    banded = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_near_dup_pairs(docs, 32, 3, 4).collect()
    }
    sims = D.simhash(docs, 32)
    a = sims.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sims.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    naive = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == naive
    assert banded[(0, 5)] == 0  # exact duplicates at distance 0


def test_simhash_near_dups_rejects_bad_bands(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError):
        D.simhash_near_dup_pairs(docs, 32, max_hamming=4, bands=4)
